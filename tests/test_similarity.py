"""Product-quantization ANN (llm/similarity.pq_topk)."""

from __future__ import annotations

import pytest

class TestProductQuantization:
    def _embeddings(self, spark, n=200, d=64, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        rows = [(i, [float(x) for x in rng.normal(size=d)])
                for i in range(n)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_pq_recall_vs_brute_force(self, spark):
        from verified_sources_spark.llm.similarity import (
            cosine_topk, pq_topk,
        )
        import pyspark.sql.functions as F

        e = self._embeddings(spark)
        q = e.filter(F.col("vec_id") < 8)
        exact = cosine_topk(e, q, k=10)
        approx = pq_topk(e, q, m=4, n_codes=16, k=10)
        ex = {(r["query_id"], r["neighbor_id"])
              for r in exact.collect()}
        ap = {(r["query_id"], r["neighbor_id"])
              for r in approx.collect()}
        # PQ with 16 codes over random gaussians is coarse; demand a
        # sane overlap, not parity (that's what rerank stages are for)
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.2, recall

    def test_pq_deterministic_across_partitionings(self, spark):
        from verified_sources_spark.llm.similarity import pq_topk
        import pyspark.sql.functions as F

        e = self._embeddings(spark, n=150)
        q = e.filter(F.col("vec_id") < 5)
        a = pq_topk(e.repartition(1), q, k=5).collect()
        b = pq_topk(e.repartition(13), q, k=5).collect()
        key = lambda r: (r["query_id"], r["rank"])
        assert sorted(((r["query_id"], r["rank"], r["neighbor_id"],
                        r["adist"]) for r in a)) == \
               sorted(((r["query_id"], r["rank"], r["neighbor_id"],
                        r["adist"]) for r in b))

    def test_pq_trained_codebooks_run_and_help(self, spark):
        from verified_sources_spark.llm.similarity import pq_topk
        import pyspark.sql.functions as F

        e = self._embeddings(spark, n=150)
        q = e.filter(F.col("vec_id") < 5)
        out = pq_topk(e, q, k=3, train_iters=2)
        rows = out.collect()
        assert len(rows) == 15
        assert all(r["adist"] >= 0 for r in rows)

    def test_pq_dim_gate(self, spark):
        from verified_sources_spark.llm.similarity import pq_topk

        e = spark.createDataFrame(
            [(0, [0.1] * 10)], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="not divisible"):
            pq_topk(e, e, m=4)


class TestIvfPq:
    def test_deterministic_and_within_probed_cells(self, spark):
        import numpy as np
        import pyspark.sql.functions as F

        from verified_sources_spark.llm.similarity import ivfpq_topk

        rng = np.random.default_rng(11)
        rows = [(i, [float(x) for x in rng.normal(size=64)])
                for i in range(180)]
        e = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        q = e.filter(F.col("vec_id") < 6)
        a = ivfpq_topk(e.repartition(1), q, k=4).collect()
        b = ivfpq_topk(e.repartition(9), q, k=4).collect()
        norm = lambda rs: sorted((r["query_id"], r["rank"],
                                  r["neighbor_id"], r["adist"])
                                 for r in rs)
        assert norm(a) == norm(b)
        assert len(a) == 24 and all(r["adist"] >= 0 for r in a)

    def test_recall_vs_exact_l2(self, spark):
        # ADC approximates L2, so the yardstick is exact L2 top-k
        # (numpy ground truth), on clustered data — the shape IVF
        # exists for
        import numpy as np
        import pyspark.sql.functions as F

        from verified_sources_spark.llm.similarity import ivfpq_topk

        rng = np.random.default_rng(3)
        centers = rng.normal(scale=6.0, size=(8, 64))
        X = np.stack([centers[i % 8] + rng.normal(size=64)
                      for i in range(240)])
        rows = [(i, [float(x) for x in X[i]]) for i in range(240)]
        e = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        q = e.filter(F.col("vec_id") < 8)
        exact = set()
        for qi in range(8):
            d = ((X - X[qi]) ** 2).sum(axis=1)
            d[qi] = np.inf
            for j in np.argsort(d)[:5]:
                exact.add((qi, int(j)))
        approx = {(r["query_id"], r["neighbor_id"])
                  for r in ivfpq_topk(e, q, n_probe=4, k=5).collect()}
        recall = len(exact & approx) / len(exact)
        # the PINNED 16-entry codebooks are a correctness witness, not
        # a tuned index: within-blob ordering is at quantization-error
        # resolution.  Random top-5 over 239 candidates would land
        # ~2%; demand an order of magnitude above chance (trained
        # codebooks + more codes are the production path)
        assert recall >= 0.15, recall


def test_rerank_improves_on_adc(spark):
    """The exact-cosine rerank of IVF-PQ candidates must match the
    brute-force ranking RESTRICTED to those candidates — and on
    clustered data the composed stack's recall beats raw ADC top-k."""
    import numpy as np
    import pyspark.sql.functions as F

    from verified_sources_spark.llm.similarity import (
        cosine_topk, ivfpq_rerank_topk, ivfpq_topk,
    )

    rng = np.random.default_rng(13)
    centers = rng.normal(scale=6.0, size=(8, 64))
    X = np.stack([centers[i % 8] + rng.normal(size=64)
                  for i in range(240)])
    rows = [(i, [float(x) for x in X[i]]) for i in range(240)]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    q = e.filter(F.col("vec_id") < 8)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(e, q, k=3).collect()}
    adc = {(r["query_id"], r["neighbor_id"])
           for r in ivfpq_topk(e, q, k=3).collect()}
    rr = {(r["query_id"], r["neighbor_id"])
          for r in ivfpq_rerank_topk(e, q, candidates=20,
                                     k=3).collect()}
    r_adc = len(exact & adc) / len(exact)
    r_rr = len(exact & rr) / len(exact)
    assert r_rr >= r_adc, (r_rr, r_adc)
    assert r_rr >= 0.5, r_rr  # rerank recovers most of the truth


class TestAnnRecall:
    """ann_recall / ann_recall_summary: an index is only useful if it
    FINDS things — and the two-stage rerank must recover recall the
    codes-only scan loses."""

    def _embeddings(self, spark, n=300, d=64, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        rows = [(i, [float(x) for x in rng.normal(size=d)])
                for i in range(n)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_recall_math_is_exact(self, spark):
        from verified_sources_spark.llm.similarity import ann_recall

        exact = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3),
             (2, 20, 1), (2, 21, 2), (2, 22, 3)],
            "query_id long, neighbor_id long, rank int")
        ann = spark.createDataFrame(
            [(1, 10, 1), (1, 12, 2), (1, 99, 3),
             (2, 98, 1), (2, 97, 2), (2, 96, 3)],
            "query_id long, neighbor_id long, rank int")
        got = {r["query_id"]: (r["n_hits"], r["recall"])
               for r in ann_recall(ann, exact, k=3).collect()}
        assert got == {1: (2, 0.6667), 2: (0, 0.0)}

    def test_rerank_recovers_recall_over_plain_ivfpq(self, spark):
        from pyspark.sql import functions as F

        from verified_sources_spark.llm.similarity import (
            ann_recall_summary, cosine_topk, ivfpq_rerank_topk,
            ivfpq_topk,
        )

        e = self._embeddings(spark)
        q = e.filter(F.col("vec_id") < 12)
        exact = cosine_topk(e, q, k=3)
        plain = ivfpq_topk(e, q, n_cells=16, n_probe=4, m=4,
                           n_codes=16, k=3)
        rerank = ivfpq_rerank_topk(e, q, n_cells=16, n_probe=4, m=4,
                                   n_codes=16, candidates=20, k=3)
        (rp,) = ann_recall_summary(plain, exact, k=3).collect()
        (rr,) = ann_recall_summary(rerank, exact, k=3).collect()
        assert rp["n_queries"] == rr["n_queries"] == 12
        # rerank re-scores 20 candidates with exact cosine: it can
        # only reorder/IMPROVE what the codes-only scan proposed
        assert rr["mean_recall"] >= rp["mean_recall"]
        assert 0.0 <= rp["mean_recall"] <= 1.0


class TestTrainedIvfPq:
    def _embeddings(self, spark, n=300, d=64, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        rows = [(i, [float(x) for x in rng.normal(size=d)])
                for i in range(n)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_trained_deterministic_across_partitionings(self, spark):
        from pyspark.sql import functions as F

        from verified_sources_spark.llm.similarity import ivfpq_topk

        e = self._embeddings(spark, n=200)
        q = e.filter(F.col("vec_id") < 5)
        a = ivfpq_topk(e.repartition(1), q, train_iters=2, k=3).collect()
        b = ivfpq_topk(e.repartition(13), q, train_iters=2, k=3).collect()
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_trained_recall_not_worse_than_pinned(self, spark):
        from pyspark.sql import functions as F

        from verified_sources_spark.llm.similarity import (
            ann_recall_summary, cosine_topk, ivfpq_rerank_topk,
        )

        e = self._embeddings(spark)
        q = e.filter(F.col("vec_id") < 12)
        exact = cosine_topk(e, q, k=3)
        kw = dict(n_cells=16, n_probe=8, m=8, n_codes=16,
                  candidates=60, k=3)
        (pinned,) = ann_recall_summary(
            ivfpq_rerank_topk(e, q, **kw), exact, k=3).collect()
        (trained,) = ann_recall_summary(
            ivfpq_rerank_topk(e, q, train_iters=2, **kw),
            exact, k=3).collect()
        assert trained["mean_recall"] >= pinned["mean_recall"], (
            trained["mean_recall"], pinned["mean_recall"])
