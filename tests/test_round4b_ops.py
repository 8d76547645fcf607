"""Round-4 additions, part 2: winnowing passage overlap, Zipf fit,
Matryoshka truncation audit, and the Q4/Q21 self-join shapes — semantics
pinned on hand-built micro-fixtures (oracle-parity suites cover the
fixture tables; these cover the guarantees and edge cases).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators import dedup, text
from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
    MATRYOSHKA_PREFIXES, truncation_audit,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestWinnowing:
    def test_guaranteed_detection_of_shared_run(self, spark):
        """The winnowing guarantee: a shared token run of length
        >= WINNOW_K + WINNOW_W - 1 must produce a shared fingerprint."""
        run = " ".join(f"s{i}" for i in
                       range(dedup.WINNOW_K + dedup.WINNOW_W - 1))
        docs = _docs(spark, [
            (1, "alpha beta gamma delta " + run + " eps zeta eta theta"),
            (2, "uno dos tres cuatro cinco " + run + " seis siete ocho"),
        ])
        fps = dedup.winnow_fingerprints(docs)
        shared = (fps.filter("doc_id = 1").select("fp")
                  .intersect(fps.filter("doc_id = 2").select("fp")))
        assert shared.count() >= 1

    def test_disjoint_docs_share_nothing(self, spark):
        docs = _docs(spark, [
            (1, " ".join(f"a{i}" for i in range(20))),
            (2, " ".join(f"b{i}" for i in range(20))),
        ])
        assert dedup.winnowing_pairs(docs, min_shared=1).count() == 0

    def test_short_docs_yield_no_fingerprints(self, spark):
        # below k + w - 1 tokens there is no complete window
        n = dedup.WINNOW_K + dedup.WINNOW_W - 2
        docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(n)))])
        assert dedup.winnow_fingerprints(docs).count() == 0

    def test_selection_subsamples_grams(self, spark):
        """Selected fingerprints are a strict subset of the k-gram hashes
        (~1/w of them for random text)."""
        toks = " ".join(f"w{i}" for i in range(100))
        docs = _docs(spark, [(1, toks)])
        n_grams = 100 - dedup.WINNOW_K + 1
        n_sel = dedup.winnow_fingerprints(docs).count()
        assert 0 < n_sel < n_grams / 2

    def test_boilerplate_fp_excluded_by_df_gate(self, spark):
        """A fingerprint present in more than max_df docs pairs nobody."""
        shared = " ".join(f"s{i}" for i in range(10))
        docs = _docs(spark, [
            (i, shared + f" tail{i} t{i}x t{i}y") for i in range(5)
        ])
        # every pair collides at max_df=20 ...
        assert dedup.winnowing_pairs(docs, min_shared=1).count() == 10
        # ... and none once the gate marks the fps boilerplate
        assert dedup.winnowing_pairs(docs, min_shared=1,
                                     max_df=4).count() == 0


class TestZipfFit:
    def test_exact_powerlaw_recovers_slope(self, spark):
        """Counts n(rank) = round(C * rank^-1) over distinct terms: the
        log-log OLS slope must come out near -1 with r2 near 1."""
        rows = []
        doc = []
        for r in range(1, 33):
            cnt = max(1, round(1024 / r))
            doc.extend([f"term{r:02d}"] * cnt)
        rows.append((1, " ".join(doc)))
        docs = spark.createDataFrame(rows, "doc_id long, text string") \
            .withColumn("source", F.lit("zipfy"))
        out = text.zipf_fit(docs).collect()
        assert len(out) == 1
        row = out[0]
        assert row["n_terms"] == 32
        assert abs(row["slope"] - (-1.0)) < 0.05
        assert row["r2"] > 0.99

    def test_uniform_counts_give_zero_slope(self, spark):
        doc = " ".join(" ".join([f"t{i}"] * 5) for i in range(20))
        docs = spark.createDataFrame([(1, doc)],
                                     "doc_id long, text string") \
            .withColumn("source", F.lit("flat"))
        row = text.zipf_fit(docs).collect()[0]
        # all y equal -> slope ~0 (float fold cancellation leaves ulps),
        # r2 undefined (den2 == 0) -> NULL
        assert abs(row["slope"]) < 1e-12
        assert row["r2"] is None

    def test_single_term_source_is_degenerate(self, spark):
        docs = spark.createDataFrame([(1, "only only only")],
                                     "doc_id long, text string") \
            .withColumn("source", F.lit("mono"))
        row = text.zipf_fit(docs).collect()[0]
        assert row["n_terms"] == 1 and row["slope"] is None


class TestTruncationAudit:
    def _vecs(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")

    def test_leading_mass_truncates_to_first_prefix(self, spark):
        v = [1.0] * 8 + [0.0] * 56
        row = truncation_audit(self._vecs(spark, [(1, v, 0)])).collect()[0]
        assert row["retention_8"] == 1.0
        assert row["min_prefix"] == MATRYOSHKA_PREFIXES[0]

    def test_tail_mass_needs_full_dim(self, spark):
        v = [0.0] * 56 + [1.0] * 8
        row = truncation_audit(self._vecs(spark, [(1, v, 0)])).collect()[0]
        assert row["retention_32"] == 0.0
        assert row["min_prefix"] == 64

    def test_uniform_mass_matches_sqrt_ratio(self, spark):
        v = [1.0] * 64
        row = truncation_audit(self._vecs(spark, [(1, v, 0)])).collect()[0]
        for p in MATRYOSHKA_PREFIXES:
            assert math.isclose(row[f"retention_{p}"],
                                math.sqrt(p / 64.0), rel_tol=1e-12)

    def test_zero_vector_retention_null_prefix_full(self, spark):
        v = [0.0] * 64
        row = truncation_audit(self._vecs(spark, [(1, v, 0)])).collect()[0]
        assert row["retention_8"] is None and row["min_prefix"] == 64


class TestSelfJoinShapes:
    def _fixture(self, spark):
        import datetime
        d = datetime.datetime
        orders = spark.createDataFrame(
            [(1, "F", d(1997, 1, 1)),   # two suppliers, one late -> waits
             (2, "F", d(1997, 1, 1)),   # two suppliers, both late -> no
             (3, "F", d(1997, 1, 1)),   # single supplier, late -> no
             (4, "O", d(1997, 1, 1))],  # not finished -> excluded
            "o_orderkey long, o_orderstatus string, o_orderdate timestamp")
        late, ok = d(1997, 6, 1), d(1997, 1, 15)
        li = spark.createDataFrame(
            [(1, 10, late), (1, 11, ok),
             (2, 10, late), (2, 11, late),
             (3, 12, late),
             (4, 13, late)],
            "l_orderkey long, l_suppkey long, l_shipdate timestamp")
        return orders, li

    def test_sole_late_supplier_semantics(self, spark, monkeypatch):
        from realtime_log_analytics_flink_kafka_spark.queries import relational

        orders, li = self._fixture(spark)
        supp = spark.createDataFrame(
            [(s, f"Supplier#{s}", 0) for s in (10, 11, 12, 13)],
            "s_suppkey long, s_name string, s_nationkey int")
        nation = spark.createDataFrame([(0, "HOME")],
                                       "n_nationkey int, n_name string")
        tables = {"orders": orders, "lineitem": li,
                  "supplier": supp, "nation": nation}
        monkeypatch.setattr(relational, "_t",
                            lambda spark, sf_dir, name: tables[name])
        out = relational.q_waiting_suppliers(spark, "ignored").collect()
        assert [(r["s_name"], r["numwait"]) for r in out] == \
            [("Supplier#10", 1)]

    def test_priority_check_counts_orders_once(self, spark, monkeypatch):
        from realtime_log_analytics_flink_kafka_spark.queries import relational

        orders, li = self._fixture(spark)
        orders = orders.withColumn("o_orderpriority", F.lit("1-URGENT"))
        # order 1 has TWO late lineitems -> must still count once
        import datetime
        extra = spark.createDataFrame(
            [(1, 14, datetime.datetime(1997, 7, 1))],
            "l_orderkey long, l_suppkey long, l_shipdate timestamp")
        tables = {"orders": orders, "lineitem": li.unionByName(extra)}
        monkeypatch.setattr(relational, "_t",
                            lambda spark, sf_dir, name: tables[name])
        out = relational.q_order_priority_check(spark, "ignored").collect()
        # orders 1, 2, 3, 4 all have a late lineitem and fall in range
        assert [(r["o_orderpriority"], r["order_count"])
                for r in out] == [("1-URGENT", 4)]


class TestBM25:
    def test_rarer_term_scores_higher_same_tf(self, spark):
        """Same tf and doc length: the doc matching the rarer term wins."""
        filler = " ".join(f"f{i}" for i in range(8))
        rows = [(1, "rare " + filler), (2, "common " + filler)]
        rows += [(10 + i, f"common pad{i} " + filler) for i in range(6)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["bm25"]
               for r in text.bm25_scores(docs, ("rare", "common")).collect()}
        assert out[1] > out[2]

    def test_score_sums_over_query_terms(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta x y"), (2, "alpha q r s"), (3, "w x y z")],
            "doc_id long, text string")
        both = {r["doc_id"]: r for r in
                text.bm25_scores(docs, ("alpha", "beta")).collect()}
        assert both[1]["n_terms_hit"] == 2 and both[2]["n_terms_hit"] == 1
        # doc 3 matches nothing -> absent
        assert 3 not in both

    def test_top_k_bound_and_order(self, spark):
        # 30 matching docs of growing length + 60 non-matching, so the
        # term's idf is positive and length normalization decides rank
        rows = [(i, "hit " + " ".join(f"p{i}x{j}" for j in range(i + 1)))
                for i in range(30)]
        rows += [(100 + i, f"m{i} n{i}") for i in range(60)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = text.bm25_scores(docs, ("hit",), k=5).collect()
        assert len(out) == 5
        scores = [r["bm25"] for r in out]
        assert scores == sorted(scores, reverse=True)
        # shorter docs rank first for equal tf (length normalization)
        assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 4]


class TestProducerFullSchema:
    """The producer now emits the reference's complete raw-log schema
    (SURVEY §1.2a) — request_id/message shape, wire round-trip."""

    def test_request_id_and_message_shape(self, spark):
        from realtime_log_analytics_flink_kafka_spark.sources.producer import (
            synthetic_log_batch,
        )
        rows = synthetic_log_batch(spark, n=200).collect()
        import re
        for r in rows:
            assert re.fullmatch(r"req-[0-9a-f]{8}", r["request_id"])
            assert r["message"]
        # messages embedding the request id carry THAT row's id
        hits = [r for r in rows if "request req-" in r["message"]]
        assert hits, "id-bearing templates must occur in 200 ticks"
        for r in hits:
            assert r["request_id"] in r["message"]
        # both levels draw from their own (disjoint) template pools
        import re as _re

        def tpl(m):
            return _re.sub(r"req-[0-9a-f]{8}|[0-9]+", "<v>", m)

        err = {tpl(r["message"]) for r in rows if r["level"] == "ERROR"}
        info = {tpl(r["message"]) for r in rows if r["level"] == "INFO"}
        assert err and info and err.isdisjoint(info)

    def test_json_wire_round_trip_full_schema(self, spark):
        """producer -> ISO timestamp projection -> to_json (keyed) ->
        from_json with RAW_LOG_SCHEMA: the reference's exact wire shape
        (kafka/log_producer.py:66-74), every field surviving."""
        from pyspark.sql import functions as F
        from realtime_log_analytics_flink_kafka_spark.schemas import (
            RAW_LOG_SCHEMA,
        )
        from realtime_log_analytics_flink_kafka_spark.sources.kafka import (
            decode_json_stream, encode_json_keyed,
        )
        from realtime_log_analytics_flink_kafka_spark.sources.producer import (
            synthetic_log_batch,
        )
        logs = synthetic_log_batch(spark, n=50).select(
            F.date_format(F.timestamp_seconds(F.col("ts_s")),
                          "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
            "service", "host", "level", "request_id", "message",
            F.col("latency_ms").cast("int").alias("latency_ms"),
        )
        wire = encode_json_keyed(logs, key_col="service")
        back = decode_json_stream(wire, RAW_LOG_SCHEMA)
        assert sorted(back.columns) == sorted(logs.columns)
        orig = {tuple(r) for r in logs.collect()}
        rt = {tuple(r[c] for c in logs.columns) for r in back.collect()}
        assert rt == orig


class TestEmbeddingAnisotropy:
    def _vecs(self, spark, arrays, label=0):
        rows = [(i, [float(x) for x in a], label)
                for i, a in enumerate(arrays)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")

    def test_collapsed_cloud_has_rank_one(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            embedding_anisotropy,
        )
        # all vectors on one line through the origin direction e0
        arrs = [[float(i + 1)] + [0.0] * 63 for i in range(20)]
        row = embedding_anisotropy(self._vecs(spark, arrs)).collect()[0]
        assert row["top_ev_share"] == 1.0
        assert abs(row["effective_rank"] - 1.0) < 1e-9

    def test_isotropic_cloud_has_high_rank(self, spark):
        import random
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            embedding_anisotropy,
        )
        rng = random.Random(7)
        arrs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(400)]
        row = embedding_anisotropy(self._vecs(spark, arrs)).collect()[0]
        assert row["top_ev_share"] < 0.1
        assert row["effective_rank"] > 30.0

    def test_two_direction_cloud_has_rank_two(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            embedding_anisotropy,
        )
        arrs = []
        for i in range(10):
            arrs.append([float(i - 4.5)] + [0.0] * 63)          # axis 0
            arrs.append([0.0, float(i - 4.5)] + [0.0] * 62)     # axis 1
        row = embedding_anisotropy(self._vecs(spark, arrs)).collect()[0]
        assert abs(row["effective_rank"] - 2.0) < 1e-6
        assert abs(row["top_ev_share"] - 0.5) < 1e-6

    def test_one_row_per_label(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            embedding_anisotropy,
        )
        rows = [(i, [float(i)] * 64, i % 3) for i in range(30)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = embedding_anisotropy(df).collect()
        assert sorted(r["label"] for r in out) == [0, 1, 2]
        assert all(r["n_vecs"] == 10 for r in out)

    def test_pandas_stage_sees_moments_not_vectors(self, spark):
        """Scale gate (VERDICT r4 design note): the grouped applyInPandas
        must consume the per-(label, batch) moment rows produced by the
        map-side mapInPandas combine — never the raw vectors — so what
        shuffles and what a group materializes is O(batches · d²), not
        the corpus."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            embedding_anisotropy,
        )
        df = embedding_anisotropy(self._vecs(spark, [[1.0] * 8] * 4))
        plan = df._jdf.queryExecution().executedPlan().toString()
        fmg = plan.index("FlatMapGroupsInPandas")
        # children print below their parent: the moment combine must sit
        # INSIDE the grouped pandas stage's input subtree
        assert "MapInPandas" in plan[fmg:], plan
