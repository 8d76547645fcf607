"""Round-10 operator tests: cache hygiene for the Mahalanobis audit
(the textrank self-cleaning pattern, VERDICT r9 next-round #6) and the
new query families added this round.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestMahalanobisCacheRelease:
    def test_no_resident_scored_cache_after_materialization(self, spark):
        """diag_mahalanobis_outliers must not leave its scored
        MEMORY_AND_DISK block resident: the labels-sized report is
        eagerly localCheckpointed inside the operator and the scored
        relation unpersisted before return, so consuming the result
        adds at most the one checkpointed report RDD."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            diag_mahalanobis_outliers)
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        vecs = spark.createDataFrame(
            [(i, [float(i % 5), float((i * 3) % 7)], i % 2)
             for i in range(40)],
            "vec_id long, embedding array<float>, label int")
        out = diag_mahalanobis_outliers(vecs, score_threshold=3.0)
        assert out.count() == 2
        after = jsc.getPersistentRDDs().size()
        # the eager localCheckpoint of the 2-row report may remain;
        # the vector-count-sized scored cache must not
        assert after - before <= 1, (before, after)


class TestHllSourceOverlap:
    def test_disjoint_and_identical_sets(self, spark):
        """Identical sets: union register files equal either side, so
        union_est == est_a and the exact Jaccard is 1; disjoint sets:
        inter_exact 0."""
        from realtime_log_analytics_flink_kafka_spark.functions.hashing import (
            md5_long)
        from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
            hll_source_overlap)
        rows = ([("a", f"t{i}") for i in range(300)]
                + [("b", f"t{i}") for i in range(300)]      # b == a
                + [("c", f"u{i}") for i in range(300)])      # c disjoint
        items = (spark.createDataFrame(rows, "source string, term string")
                 .select("source", md5_long(F.col("term")).alias("h")))
        out = {(r.source_a, r.source_b): r
               for r in hll_source_overlap(items, "source", "h").collect()}
        ab = out[("a", "b")]
        assert ab.jaccard_exact == 1.0 and ab.inter_exact == 300
        # merged registers of identical sets are the per-set registers
        assert ab.union_est == ab.inter_est or ab.jaccard_est == 1.0
        ac = out[("a", "c")]
        assert ac.inter_exact == 0 and ac.union_exact == 600
        # HLL estimate at p=8 lands within ~4 sigma of the truth
        assert abs(ac.union_est - 600) / 600 < 0.3


class TestPartitionModularity:
    def test_hand_computed_contributions(self, spark):
        """Graph: triangle {1,2,3} + edge {4,5}, m=4.  Partition A =
        {1,2,3}, B = {4,5} (components on their own graph): e_A=3,
        d_A=6, e_B=1, d_B=2 -> contributions 3/4-(6/8)^2 and
        1/4-(2/8)^2; Q = sum = 0.375."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            partition_modularity)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 5)], "doc_a long, doc_b long")
        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
            "doc_id long, cluster_id long")
        got = {r.cluster_id: r for r in
               partition_modularity(pairs, labels).collect()}
        assert got[1].internal_edges == 3 and got[1].degree_sum == 6
        assert got[1].contribution == 3 / 4 - (6 / 8) ** 2
        assert got[4].contribution == 1 / 4 - (2 / 8) ** 2
        assert abs(sum(r.contribution for r in got.values()) - 0.375) < 1e-9

    def test_unlabeled_nodes_become_singletons(self, spark):
        """A graph node missing from the partition is its own cluster:
        zero internal edges, its degree, negative contribution."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            partition_modularity)
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        labels = spark.createDataFrame([(1, 7)], "doc_id long, cluster_id long")
        got = {r.cluster_id: r for r in
               partition_modularity(pairs, labels).collect()}
        assert set(got) == {7, 2}
        assert got[2].internal_edges == 0 and got[2].n_nodes == 1
        assert got[2].contribution == -(1 / 2) ** 2


class TestKmeansSilhouette:
    def test_separated_clusters_score_high(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            kmeans_silhouette)
        rows = ([(i, [0.0 + 0.01 * i, 0.0], 0) for i in range(10)]
                + [(100 + i, [10.0, 10.0 + 0.01 * i], 1) for i in range(10)])
        out = {r.label: r for r in kmeans_silhouette(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int")
        ).collect()}
        assert out[0].n_vecs == 10 and out[0].n_negative == 0
        assert out[0].mean_silhouette > 0.9 and out[1].mean_silhouette > 0.9

    def test_misassigned_vector_goes_negative(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            kmeans_silhouette)
        rows = ([(i, [0.0, float(i % 3)], 0) for i in range(9)]
                + [(99, [10.0, 10.0], 0)]          # sits on cluster 1
                + [(100 + i, [10.0, 10.0 + i % 3], 1) for i in range(9)])
        out = {r.label: r for r in kmeans_silhouette(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int")
        ).collect()}
        assert out[0].n_negative >= 1


class TestSeasonalDecompose:
    def test_weekly_spike_lands_in_seasonal(self, spark):
        """Flat 10/day series with +7 every Monday across 4 weeks: the
        spike must be absorbed by the seasonal component (Monday
        seasonal high, other weekdays slightly negative), with y ==
        trend + seasonal + residual on every row."""
        from datetime import datetime, timedelta
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            seasonal_decompose)
        t0 = datetime(2024, 1, 1)  # a Monday
        rows = []
        eid = 0
        for d in range(28):
            n = 10 + (7 if d % 7 == 0 else 0)
            for k in range(n):
                rows.append((eid, t0 + timedelta(days=d, seconds=k),
                             "svc", 1.0))
                eid += 1
        logs = spark.createDataFrame(
            rows, "event_id long, ts timestamp, service string, v double"
        ).withColumn("is_error", F.lit(1))
        out = {r.dow: r for r in seasonal_decompose(logs).collect()
               if r.day_epoch < 19725 + 7}  # first week only
        assert len(out) == 7
        monday = max(out.values(), key=lambda r: r.seasonal)
        assert monday.y == 17 and monday.seasonal > 4
        for r in out.values():
            assert abs((r.trend + r.seasonal + r.residual) - r.y) < 1e-6


class TestRevenueTheil:
    def test_even_and_concentrated_segments(self, spark):
        """Perfectly even spend -> T = 0 (every term ln(1)); a whale
        segment -> T > 0; a single-customer segment -> T = ln(1) = 0."""
        from realtime_log_analytics_flink_kafka_spark.queries.relational import (
            q_revenue_theil)
        import tempfile, os
        from datetime import date
        d = tempfile.mkdtemp()
        day = date(1995, 1, 1)
        orders = spark.createDataFrame(
            # EVEN: 4 customers x $100; WHALE: 3x$1 + 1x$997; SOLO: 1x$5
            [(i, i, "O", 100.0, day, "1-URGENT") for i in range(4)]
            + [(10 + i, 10 + i, "O", 1.0, day, "1-URGENT")
               for i in range(3)]
            + [(13, 13, "O", 997.0, day, "1-URGENT"),
               (20, 20, "O", 5.0, day, "1-URGENT")],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate date, o_orderpriority string")
        cust = spark.createDataFrame(
            [(i, f"c{i}", 0, 0.0, "EVEN") for i in range(4)]
            + [(10 + i, f"c{10+i}", 0, 0.0, "WHALE") for i in range(4)]
            + [(20, "c20", 0, 0.0, "SOLO")],
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string")
        orders.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        cust.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
        out = {r.segment: r for r in q_revenue_theil(spark, d).collect()}
        assert out["EVEN"].theil == 0.0 and out["SOLO"].theil == 0.0
        assert out["WHALE"].theil > 1.0  # 997/1000 on one of four
        assert out["WHALE"].total_spend_d == 1000


class TestDupClusterSources:
    def test_tie_breaks_lexicographically(self, spark):
        """partition_modularity's sibling verdict, exercised through the
        PRODUCTION operator (dedup.cluster_source_composition — the same
        code q_dup_cluster_sources runs, ADVICE r10): equal source
        counts pick the lexicographically smallest source;
        single-source clusters flag."""
        from realtime_log_analytics_flink_kafka_spark.operators import dedup
        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
            "doc_id long, cluster_id long")
        docs = spark.createDataFrame(
            [(1, "srcB"), (2, "srcA"), (3, "srcC"),
             (4, "srcZ"), (5, "srcZ")],
            "doc_id long, source string")
        got = {r.cluster_id: r
               for r in dedup.cluster_source_composition(comp, docs)
               .collect()}
        assert got[1].top_source == "srcA" and got[1].n_sources == 3
        assert got[1].n_docs == 3 and not got[1].single_source
        assert float(got[1].top_share) == 0.3333
        assert got[4].top_source == "srcZ" and got[4].n_sources == 1
        assert got[4].single_source and float(got[4].top_share) == 1.0


class TestDhashBandingInvariants:
    def test_pigeonhole_recall_guarantee(self):
        """The banded join's recall proof, property-tested: for ANY two
        64-bit fingerprints within DHASH_MAX_HAMMING, at least one of
        the 4 x 16-bit bands is identical — so the equi-join can never
        miss a qualifying pair (candidate generation is lossless below
        the bound; the hamming predicate only REMOVES collisions)."""
        from hypothesis import given, strategies as st
        from realtime_log_analytics_flink_kafka_spark.operators.multimodal import (
            DHASH_BANDS, DHASH_BAND_BITS, DHASH_MAX_HAMMING)

        mask = (1 << DHASH_BAND_BITS) - 1

        @given(st.integers(0, (1 << 64) - 1),
               st.sets(st.integers(0, 63), max_size=DHASH_MAX_HAMMING))
        def check(a, flipped_bits):
            b = a
            for bit in flipped_bits:
                b ^= 1 << bit
            shared = any(((a >> (DHASH_BAND_BITS * i)) & mask)
                         == ((b >> (DHASH_BAND_BITS * i)) & mask)
                         for i in range(DHASH_BANDS))
            assert shared

        check()

    def test_gray_grid_uneven_block_means_exact(self):
        """_gray_grid's integer block means on dimensions that do NOT
        divide the 8x9 grid evenly: a 10x11 all-gray-70 PPM reduces to
        a grid of exactly 70s (sum // count per block, no float)."""
        from realtime_log_analytics_flink_kafka_spark.operators.multimodal import (
            _gray_grid, synth_ppm)
        g = _gray_grid(synth_ppm(11, 10, 70))
        assert g.shape == (8, 9) and (g == 70).all()
