"""Round-7 operators: dup-graph triangle census, Bloom prefilter,
CUSUM drift detector, gate-agreement kappa."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_log_analytics_flink_kafka_spark.operators import dedup
from tests.conftest import SF_SMOKE


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return dedup.triangle_stats(df).first()


class TestTriangleStats:
    def test_clique_k4(self, spark):
        """K4: every wedge closes — 4 triangles, cc = 1."""
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        r = _tri(spark, k4)
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) \
            == (4, 6, 12, 4)
        assert r.global_cc == 1.0

    def test_star_has_no_triangles(self, spark):
        """Hub-and-spoke (the template-duplication shape): all wedges
        open — cc = 0."""
        star = [(0, i) for i in range(1, 5)]
        r = _tri(spark, star)
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) \
            == (5, 4, 6, 0)
        assert r.global_cc == 0.0

    def test_two_triangles_sharing_an_edge(self, spark):
        edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        r = _tri(spark, edges)
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) \
            == (4, 5, 8, 2)
        assert r.global_cc == 0.75  # 3*2/8

    def test_path_graph(self, spark):
        r = _tri(spark, [(1, 2), (2, 3)])
        assert (r.n_wedges, r.n_triangles) == (1, 0)

    def test_matches_bruteforce_on_fixture_pairs(self, spark):
        """Degree-ordered wedge join vs an O(n^3) driver-side check on
        the sf-smoke LSH pair graph."""
        from itertools import combinations

        pairs = dedup.minhash_lsh_pairs(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet"),
            threshold=0.4)
        got = dedup.triangle_stats(pairs).first()
        edges = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = sum(1 for a, b, c in combinations(sorted(adj), 3)
                   if b in adj[a] and c in adj[a] and c in adj[b])
        assert got.n_triangles == want
        assert got.n_edges == len(edges)
        assert got.n_wedges == sum(
            len(v) * (len(v) - 1) // 2 for v in adj.values())


class TestPagerank:
    def test_star_ranks_hub_highest(self, spark):
        """Hub-and-spoke: the hub must dominate; a clique stays
        uniform.  Values checked against the sequential power-iteration
        recurrence with the same sorted-sum order."""
        star = [(0, i) for i in range(1, 5)]
        df = spark.createDataFrame(star, "doc_a long, doc_b long")
        got = {r.doc_id: (r.deg, r.pr)
               for r in dedup.pagerank(df).collect()}
        # python reference with identical float ops
        import itertools
        adj = {0: [1, 2, 3, 4], 1: [0], 2: [0], 3: [0], 4: [0]}
        deg = {n: len(v) for n, v in adj.items()}
        pr = {n: 1.0 / 5.0 for n in adj}
        for _ in range(3):
            pr = {v: 0.15 / 5.0 + 0.85 * sum(
                sorted(pr[u] / float(deg[u]) for u in adj[v]))
                for v in adj}
        for n in adj:
            assert got[n][0] == deg[n]
            assert got[n][1] == pr[n], n  # bit-equal: identical DAG
        assert got[0][1] > 3 * got[1][1]  # hub dominates

    def test_clique_is_uniform(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        df = spark.createDataFrame(k4, "doc_a long, doc_b long")
        prs = {r.pr for r in dedup.pagerank(df).collect()}
        assert len(prs) == 1  # symmetry => identical rank

    def test_rank_mass_is_conserved(self, spark):
        """Σ pr stays 1 on a graph with no dangling nodes (undirected,
        deg >= 1 everywhere)."""
        import math

        edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (5, 6)]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        total = sum(r.pr for r in dedup.pagerank(df).collect())
        assert math.isclose(total, 1.0, rel_tol=1e-12)


class TestBloom:
    def test_no_false_negatives_and_merge_is_union(self, spark):
        """Bloom invariants: (1) every present term tests positive (no
        false negatives — the property a prefilter leans on); (2) the
        set-bit relation of a split corpus unions to the full one."""
        from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
            BLOOM_K, bloom_set_bits)
        from realtime_log_analytics_flink_kafka_spark.functions.hashing import (
            affine_hashes, md5_long)
        from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
            _cms_bucket, BLOOM_M)

        rows = [("g1", f"term{i}") for i in range(400)] + \
               [("g2", f"other{i}") for i in range(50)]
        df = spark.createDataFrame(rows, "source string, term string")
        bits = bloom_set_bits(df, "term", ("source",))
        got = {(r.source, r.bit) for r in bits.collect()}

        # (2) union-merge: halves union to the full set-bit relation
        a = bloom_set_bits(
            spark.createDataFrame(rows[::2], "source string, term string"),
            "term", ("source",))
        b = bloom_set_bits(
            spark.createDataFrame(rows[1::2], "source string, term string"),
            "term", ("source",))
        merged = {(r.source, r.bit)
                  for r in a.unionAll(b).distinct().collect()}
        assert merged == got

        # (1) no false negatives: every member's k bits are all set
        h = md5_long(F.col("term"))
        probe = df
        for j, (ca, cb) in enumerate(affine_hashes(BLOOM_K)):
            probe = probe.withColumn(
                f"b{j}", _cms_bucket(h, ca, cb, BLOOM_M))
        for r in probe.collect():
            for j in range(BLOOM_K):
                assert (r.source, r[f"b{j}"]) in got, (r.source, r.term)

    def test_bloom_audit_invariants_on_fixture(self, spark):
        from realtime_log_analytics_flink_kafka_spark.queries import (
            all_queries)

        rows = all_queries()["bloom_prefilter_audit"] \
            .fn(spark, SF_SMOKE).collect()
        assert rows
        for r in rows:
            assert r.n_probes == 100
            assert r.n_bloom_pos >= r.n_present, r  # no false negatives
            assert r.n_false_pos == r.n_bloom_pos - r.n_present, r
            assert 0 <= r.fpr <= 1


class TestGateAgreementKappa:
    def test_matches_fraction_exact_kappa_on_fixture(self, spark):
        """kappa from the double-DAG must equal the Fraction-exact
        value half-rounded at 1e-6 (the counts are small enough here
        that the double arithmetic is exact)."""
        from fractions import Fraction

        from realtime_log_analytics_flink_kafka_spark.queries import (
            all_queries)

        rows = all_queries()["gate_agreement_kappa"] \
            .fn(spark, SF_SMOKE).collect()
        assert rows
        saw_nonzero = False
        for r in rows:
            a, b, c, d = (r.n_both_pass, r.n_quality_only,
                          r.n_lang_only, r.n_both_fail)
            n = a + b + c + d
            assert n == r.n_docs
            pe = Fraction((a + b) * (a + c) + (c + d) * (b + d), n * n)
            po = Fraction(a + d, n)
            if pe == 1:
                assert r.kappa is None
                continue
            exact = (po - pe) / (1 - pe)
            import math
            want = math.copysign(
                math.floor(abs(exact) * 10**6 + Fraction(1, 2)), exact
            ) / 10**6
            assert r.kappa == want, (r.source, exact)
            saw_nonzero = saw_nonzero or r.kappa != 0
        assert saw_nonzero

    def test_degenerate_constant_gate_yields_null(self, spark):
        """One constant gate => pe == 1 => kappa undefined (NULL), not
        a division blowup."""
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            q_gate_agreement_kappa)  # noqa: F401  (import parity)
        # build via the operator pieces: all docs pass both gates
        df = spark.createDataFrame(
            [("s", 1, 1)] * 8, "source string, ga long, gb long")
        nd = F.col("n").cast("double")
        ad, bd, cd, dd = [F.col(x).cast("double") for x in "abcd"]
        s = df.groupBy("source").agg(
            F.count("*").alias("n"),
            F.sum(F.col("ga") * F.col("gb")).alias("a"),
            F.sum(F.col("ga") * (1 - F.col("gb"))).alias("b"),
            F.sum((1 - F.col("ga")) * F.col("gb")).alias("c"),
            F.sum((1 - F.col("ga")) * (1 - F.col("gb"))).alias("d"),
        ).withColumn("pe", (ad + bd) * (ad + cd) + (cd + dd) * (bd + dd))
        den = nd * nd - F.col("pe")
        [r] = s.select(F.when(den != 0, F.lit(1.0)).alias("k")).collect()
        assert r.k is None


class TestHdrHistogram:
    def test_bucket_monotone_and_bounds(self, spark):
        """hdr_bucket is monotone, hdr_lower inverts to the bucket's
        true lower bound, and every value sits in [lower, lower+width)
        with width/lower <= 1/8 — over an adversarial value sweep
        (octave boundaries ±1 and random values)."""
        import random

        from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
            HDR_MAX_EXP, hdr_bucket, hdr_lower)

        rng = random.Random(5)
        vals = sorted(set(
            [1, 2, 7, 8, 15, 16, 17]
            + [(1 << j) + d for j in range(3, HDR_MAX_EXP + 1)
               for d in (-1, 0, 1)]
            + [rng.randint(1, 1 << 40) for _ in range(500)]))
        df = spark.createDataFrame([(v,) for v in vals], "c long")
        rows = (df.select("c", hdr_bucket(F.col("c")).alias("b"))
                .withColumn("lo", hdr_lower(F.col("b")))
                .orderBy("c").collect())
        prev_b = -1
        for r in rows:
            assert r.b >= prev_b, (r.c, r.b, prev_b)  # monotone
            prev_b = r.b
            width = 1 if r.b < 16 else 1 << (r.b // 8 - 1)
            assert r.lo <= r.c < r.lo + width, (r.c, r.b, r.lo, width)
            if r.b >= 16:
                assert width * 8 <= r.lo  # relative width <= 1/8

    def test_quantile_estimates_bounded_on_fixture(self, spark):
        """est <= exact < est·(1 + 1/8) for every quantile and service
        (the sketch's guarantee), and the sketch is an order of
        magnitude smaller than the exact value-domain histogram."""
        from realtime_log_analytics_flink_kafka_spark.queries import (
            all_queries)

        rows = all_queries()["hdr_latency_quantiles"] \
            .fn(spark, SF_SMOKE).collect()
        assert rows
        for r in rows:
            for q in (50, 95, 99):
                est = r[f"est_p{q}_cs"]
                exact = r[f"exact_p{q}_cs"]
                # bucket width: 1 in the linear region (est < 16), else
                # est = m·2^k with m in [8,16) => k = bit_length - 4
                width = 1 if est < 16 else 1 << (est.bit_length() - 4)
                assert est <= exact < est + width, (r.service, q)
            assert r.n_sketch_cells < r.n_exact_cells

    def test_cells_merge_by_addition(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
            hdr_cells)

        import random
        rng = random.Random(9)
        rows = [("k", rng.randint(1, 10**6)) for _ in range(2000)]
        df = spark.createDataFrame(rows, "k string, c long")
        full = {(r.k, r.bucket): r.cnt
                for r in hdr_cells(df, "k", "c").collect()}
        a = hdr_cells(spark.createDataFrame(rows[::2], "k string, c long"),
                      "k", "c")
        b = hdr_cells(spark.createDataFrame(rows[1::2], "k string, c long"),
                      "k", "c")
        merged = (a.unionAll(b).groupBy("k", "bucket")
                  .agg(F.sum("cnt").cast("long").alias("cnt")))
        assert {(r.k, r.bucket): r.cnt for r in merged.collect()} == full


class TestEffectiveRank:
    def test_trace_identity_matches_eigh(self, spark):
        """(Σλ)²/Σλ² from the oracle-checkable trace path must equal
        embedding_anisotropy's eigendecomposition-based effective rank
        (different float paths — tolerance, not bit-equality), making
        the rows-only op cross-validated by a hash-checked twin."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            embedding_anisotropy, embedding_effective_rank)

        embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        tr = {r.label: r for r in embedding_effective_rank(embs).collect()}
        ei = {r.label: r for r in embedding_anisotropy(embs).collect()}
        assert set(tr) == set(ei) and tr
        for lab in tr:
            assert tr[lab].n_vecs == ei[lab].n_vecs
            assert abs(tr[lab].effective_rank
                       - ei[lab].effective_rank) < 1e-3, lab
            # a healthy isotropic synthetic cloud: rank well above 1
            assert tr[lab].effective_rank > 5.0

    def test_collapsed_cloud_has_rank_one(self, spark):
        """All vectors on one line => one nonzero eigenvalue => the
        participation ratio is exactly 1 (and total_var > 0)."""
        import random

        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            embedding_effective_rank)

        rng = random.Random(3)
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows = [(i, [t * b for b in base], 0)
                for i, t in enumerate(rng.uniform(-2, 2)
                                      for _ in range(40))]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        [r] = embedding_effective_rank(df).collect()
        assert abs(r.effective_rank - 1.0) < 1e-6 and r.total_var > 0


class TestTokenBudgetAllocation:
    def test_matches_independent_water_fill(self, spark):
        """The closed-form (prefix-sum k*) allocation must equal an
        independent binary-search water fill with largest-remainder
        distribution, sum EXACTLY to the budget, respect caps, keep
        uncapped allocations within 1 of each other — and the fixture
        constants must exercise BOTH classes."""
        from realtime_log_analytics_flink_kafka_spark.queries import (
            all_queries)
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            ALLOC_BUDGET_DEN, ALLOC_BUDGET_NUM)

        rows = all_queries()["token_budget_allocation"] \
            .fn(spark, SF_SMOKE).collect()
        caps = {r.source: r.cap for r in rows}
        got = {r.source: r.allocated for r in rows}
        b = ALLOC_BUDGET_NUM * sum(r.tokens for r in rows) \
            // ALLOC_BUDGET_DEN

        def filled(level):
            return sum(min(c, level) for c in caps.values())

        lo, hi = 0, max(caps.values())
        while lo < hi:  # largest L with filled(L) <= b
            mid = (lo + hi + 1) // 2
            if filled(mid) <= b:
                lo = mid
            else:
                hi = mid - 1
        level, rem = lo, b - filled(lo)
        want = {}
        bump = rem
        for s in sorted(caps, key=lambda s: (caps[s], s)):
            if caps[s] <= level:
                want[s] = caps[s]
            else:
                want[s] = level + (1 if bump > 0 else 0)
                bump -= 1 if bump > 0 else 0
        assert got == want
        assert sum(got.values()) == b
        assert all(got[s] <= caps[s] for s in got)
        unc = [r.allocated for r in rows if not r.is_capped]
        assert unc and max(unc) - min(unc) <= 1
        assert any(r.is_capped for r in rows)  # both classes exercised


class TestRetrievalNdcg:
    def test_invariants_and_fusion_dominance(self, spark):
        """NDCG in [0, 1]; both lists fully ranked (k rows); the
        RRF-fused ranking must recover at least as much of the dense
        relevance signal as the lexical branch alone (it contains the
        dense branch's ranks by construction)."""
        from realtime_log_analytics_flink_kafka_spark.queries import (
            all_queries)
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            HYBRID_K, _NDCG_IDCG, _NDCG_W)

        rows = {r.method: r for r in all_queries()["retrieval_ndcg"]
                .fn(spark, SF_SMOKE).collect()}
        assert set(rows) == {"lexical", "hybrid"}
        for r in rows.values():
            assert r.n_ranked == HYBRID_K
            assert 0.0 <= r.ndcg <= 1.0
            assert abs(r.dcg - r.ndcg * _NDCG_IDCG) < 1e-4
        assert rows["hybrid"].ndcg >= rows["lexical"].ndcg
        # weights are the canonical discount sequence
        import math
        assert _NDCG_W[0] == 1.0 and _NDCG_W[1] == 1.0 / math.log2(3.0)


class TestCusumDrift:
    def _run(self, spark, series: dict[str, list[int]]):
        """Build error logs with the given per-service daily counts and
        run cusum_drift; returns rows keyed by service."""
        from datetime import datetime, timedelta, timezone

        t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
        rows = []
        for svc, counts in series.items():
            for d, n in enumerate(counts):
                for i in range(n):
                    rows.append((svc, t0 + timedelta(days=d, seconds=i)))
        df = spark.createDataFrame(rows, "service string, ts timestamp")
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            cusum_drift)
        return {r.service: r for r in cusum_drift(df).collect()}

    @staticmethod
    def _reference(counts: list[int]):
        """The canonical CUSUM recurrence C_t = max(0, C_{t-1} + y - k)
        — the window-identity implementation must match it exactly.
        Zero-count days are SKIPPED (a groupBy over logs cannot observe
        them; zero-fill is service_daily_gapfill's job), so the
        recurrence runs over observed days only, like the operator."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            CUSUM_H_MULT)

        obs = [(d, y) for d, y in enumerate(counts) if y > 0]
        k = sum(y for _, y in obs) // len(obs)
        c, max_c, alarms, first = 0, 0, 0, None
        for d, y in obs:
            c = max(0, c + y - k)
            max_c = max(max_c, c)
            if c > CUSUM_H_MULT * k:
                alarms += 1
                if first is None:
                    first = d
        return k, max_c, alarms, first

    def test_matches_recurrence_on_level_shift(self, spark):
        """A planted +200% level shift must alarm, and every output
        column must equal the sequential recurrence."""
        shift = [5] * 10 + [15] * 10
        flat = [7] * 20
        got = self._run(spark, {"svc-shift": shift, "svc-flat": flat})
        epoch0 = 19723  # 2024-01-01 in epoch days
        for svc, counts in (("svc-shift", shift), ("svc-flat", flat)):
            k, max_c, alarms, first = self._reference(counts)
            r = got[svc]
            assert (r.k_ref, r.max_cusum, r.n_alarm_days) \
                == (k, max_c, alarms), svc
            assert r.first_alarm_day == (
                None if first is None else epoch0 + first), svc
        assert got["svc-shift"].n_alarm_days > 0
        assert got["svc-flat"].n_alarm_days == 0

    def test_matches_recurrence_on_random_series(self, spark):
        import random

        rng = random.Random(42)
        series = {f"s{i}": [rng.randint(0, 40) for _ in range(30)]
                  for i in range(4)}
        got = self._run(spark, series)
        for svc, counts in series.items():
            k, max_c, alarms, first = self._reference(counts)
            r = got[svc]
            assert (r.k_ref, r.max_cusum, r.n_alarm_days) \
                == (k, max_c, alarms), svc
