"""Persisted ANN index API: build once / query many, save/load, and
bit-parity with the one-shot search paths."""

import numpy as np
import pytest

from tumult_analytics_spark.operators import similarity as S


def _emb_df(spark, n=300, dim=8, seed=3):
    rnd = np.random.RandomState(seed)
    rows = [
        (int(i), [float(v) for v in rnd.normal(size=dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _rounded(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 6), r["rank"])
        for r in df.collect()
    )


class TestLshIndex:
    def test_matches_one_shot_path(self, spark):
        df = _emb_df(spark)
        one_shot = S.lsh_cosine_topk(
            df, "embedding", "vec_id", k=3, bits=6, tables=2, dim=8,
            plane_kind="rademacher", deterministic=True,
        )
        idx = S.build_lsh_index(
            df, "embedding", "vec_id", bits=6, tables=2, dim=8,
            plane_kind="rademacher",
        )
        via_index = S.query_lsh_index(idx, df, k=3, deterministic=True)
        assert _rounded(via_index) == _rounded(one_shot)

    def test_index_is_materialized_once(self, spark):
        df = _emb_df(spark, n=100)
        idx = S.build_lsh_index(df, "embedding", "vec_id", dim=8)
        # The index DataFrame is a checkpoint scan, not a live plan over
        # the corpus: querying twice re-reads materialized blocks
        # instead of recomputing signatures.
        plan = idx.df._jdf.queryExecution().optimizedPlan().toString()
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
        a = S.query_lsh_index(idx, df, k=2, deterministic=True)
        b = S.query_lsh_index(idx, df, k=2, deterministic=True)
        assert _rounded(a) == _rounded(b)

    def test_save_load_roundtrip(self, spark, tmp_path):
        df = _emb_df(spark, n=120)
        idx = S.build_lsh_index(
            df, "embedding", "vec_id", bits=6, tables=2, dim=8,
            plane_kind="rademacher",
        )
        before = _rounded(S.query_lsh_index(idx, df, k=2, deterministic=True))
        path = str(tmp_path / "lsh_index")
        idx.save(path)
        loaded = S.AnnIndex.load(spark, path)
        assert loaded.kind == "lsh"
        assert loaded.params == idx.params
        after = _rounded(
            S.query_lsh_index(loaded, df, k=2, deterministic=True)
        )
        assert after == before

    def test_kind_mismatch_raises(self, spark):
        df = _emb_df(spark, n=50)
        idx = S.build_ivf_index(
            df, "embedding", "vec_id", nlist=4, sample_size=50
        )
        with pytest.raises(ValueError, match="expected an lsh index"):
            S.query_lsh_index(idx, df)


class TestIvfIndex:
    def test_matches_one_shot_path(self, spark):
        df = _emb_df(spark)
        cents = [
            r["embedding"]
            for r in df.filter("vec_id < 8").orderBy("vec_id").collect()
        ]
        one_shot = S.ivf_cosine_topk(
            df, "embedding", "vec_id", k=3, nlist=8, nprobe=2,
            centroids=cents, deterministic=True,
        )
        idx = S.build_ivf_index(
            df, "embedding", "vec_id", nlist=8, centroids=cents
        )
        via_index = S.query_ivf_index(
            idx, df, k=3, nprobe=2, deterministic=True
        )
        assert _rounded(via_index) == _rounded(one_shot)

    def test_save_load_roundtrip(self, spark, tmp_path):
        df = _emb_df(spark, n=150)
        cents = [
            r["embedding"]
            for r in df.filter("vec_id < 6").orderBy("vec_id").collect()
        ]
        idx = S.build_ivf_index(
            df, "embedding", "vec_id", nlist=6, centroids=cents
        )
        before = _rounded(
            S.query_ivf_index(idx, df, k=2, nprobe=2, deterministic=True)
        )
        path = str(tmp_path / "ivf_index")
        idx.save(path)
        loaded = S.AnnIndex.load(spark, path)
        assert loaded.kind == "ivf"
        after = _rounded(
            S.query_ivf_index(loaded, df, k=2, nprobe=2, deterministic=True)
        )
        assert after == before

    def test_separate_query_set(self, spark):
        # Query rows disjoint from the corpus: every corpus neighbor is
        # eligible (no self-exclusion kicks in) and ranks are 1..k.
        corpus = _emb_df(spark, n=200, seed=1)
        queries = spark.createDataFrame(
            [
                (int(1000 + i), [float(v) for v in row])
                for i, row in enumerate(
                    np.random.RandomState(9).normal(size=(20, 8))
                )
            ],
            "vec_id long, embedding array<double>",
        )
        cents = [
            r["embedding"]
            for r in corpus.filter("vec_id < 6").orderBy("vec_id").collect()
        ]
        idx = S.build_ivf_index(
            corpus, "embedding", "vec_id", nlist=6, centroids=cents
        )
        out = S.query_ivf_index(idx, queries, k=3, nprobe=3)
        rows = out.collect()
        assert {r["query_id"] for r in rows} <= set(range(1000, 1020))
        assert all(r["neighbor_id"] < 1000 for r in rows)
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == list(range(1, len(v) + 1))
                   for v in per_q.values())

    def test_kind_mismatch_raises(self, spark):
        df = _emb_df(spark, n=50)
        idx = S.build_lsh_index(df, "embedding", "vec_id", dim=8)
        with pytest.raises(ValueError, match="expected an ivf index"):
            S.query_ivf_index(idx, df)
