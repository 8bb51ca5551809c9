"""Tests for the round-3 pipeline operators: repetition/PII signals,
deterministic sampling, contamination, mixing weights, and
connected-components clustering."""

import pytest
from pyspark.sql import functions as F

from tumult_analytics_spark.operators import pipeline as P


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat the cat sat again", "en"),
        (1, "spam spam spam spam spam spam", "en"),
        (2, "uno dos tres cuatro cinco", "es"),
        (3, "short", "en"),
        (4, None, "de"),
        (5, "", "fr"),
        (6, "mail me at bob@example.com or visit https://example.com/x "
            "card 1234567890123456", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestNgramRepetition:
    def test_all_identical_tokens_max_ratio(self, docs):
        out = {
            r["doc_id"]: (r["dup2_ratio"], r["dup3_ratio"])
            for r in P.ngram_repetition(docs, "text").collect()
        }
        # "spam" x6 -> 5 bigrams all equal -> 4/5 repeats.
        assert out[1][0] == pytest.approx(4 / 5)
        assert out[1][1] == pytest.approx(3 / 4)
        # all-distinct bigrams -> 0.0
        assert out[2] == (0.0, 0.0)
        # fewer tokens than n, null, empty -> 0.0 not error
        assert out[3] == (0.0, 0.0)
        assert out[4] == (0.0, 0.0)
        assert out[5] == (0.0, 0.0)

    def test_partial_repeats(self, docs):
        row = (
            P.ngram_repetition(docs, "text")
            .filter("doc_id = 0")
            .first()
        )
        # 10 tokens -> 9 bigrams, "the cat"/"cat sat" repeat once each.
        assert row["dup2_ratio"] == pytest.approx(2 / 9)


class TestPiiStats:
    def test_counts(self, docs):
        row = P.pii_stats(docs, "text").filter("doc_id = 6").first()
        assert row["n_email"] == 1
        assert row["n_url"] == 1
        assert row["n_long_digits"] == 1

    def test_null_text_zero(self, docs):
        row = P.pii_stats(docs, "text").filter("doc_id = 4").first()
        # regexp_count of NULL is NULL in Spark; operator contract is
        # "count per document" so nulls surface as null (callers filter).
        assert row["n_email"] is None or row["n_email"] == 0


class TestStratifiedSample:
    def test_deterministic_and_rate_bounded(self, spark):
        df = spark.range(0, 4000).withColumn(
            "stratum", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
        )
        rates = {"a": 0.5, "b": 0.1}
        s1 = P.stratified_sample(df, "stratum", rates, "id")
        s2 = P.stratified_sample(df, "stratum", rates, "id")
        c1 = {r["stratum"]: r["n"] for r in
              s1.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
        c2 = {r["stratum"]: r["n"] for r in
              s2.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
        assert c1 == c2  # same rows every run
        assert abs(c1["a"] / 2000 - 0.5) < 0.06
        assert abs(c1["b"] / 2000 - 0.1) < 0.04

    def test_default_rate_drops_unknown_strata(self, spark):
        df = spark.range(0, 100).withColumn("stratum", F.lit("zz"))
        assert P.stratified_sample(df, "stratum", {"a": 1.0}, "id").count() == 0

    def test_uniform_is_in_unit_interval(self, spark):
        df = spark.range(0, 1000).select(
            P.deterministic_uniform(F.col("id")).alias("u")
        )
        row = df.agg(F.min("u"), F.max("u")).first()
        assert 0.0 <= row[0] and row[1] < 1.0


class TestNgramContamination:
    def test_exact_and_disjoint(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "a b c d e f"),      # grams subset-share with bench
                (2, "x y z w q r"),      # disjoint
                (3, "a b c d e"),        # exactly the single bench gram
                (4, "tiny"),             # < n tokens -> 0.0
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "a b c d e")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["contamination"]
            for r in P.ngram_contamination(
                corpus, bench, "text", "doc_id", n=5
            ).collect()
        }
        assert out[1] == pytest.approx(0.5)  # grams: abcde, bcdef
        assert out[2] == 0.0
        assert out[3] == pytest.approx(1.0)
        assert out[4] == 0.0

    def test_plan_broadcasts_benchmark(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(2, "a b c d e")], "doc_id long, text string"
        )
        plan = (
            P.ngram_contamination(corpus, bench, "text", "doc_id", n=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestDomainMixWeights:
    def test_weights_normalize_and_flatten(self, spark):
        df = spark.createDataFrame(
            [("big", 900), ("small", 100)], "d string, n long"
        )
        out = {r["d"]: r for r in
               P.domain_mix_weights(df, "d", "n", alpha=0.5).collect()}
        assert out["big"]["share"] == pytest.approx(0.9)
        tot_w = out["big"]["weight"] + out["small"]["weight"]
        assert tot_w == pytest.approx(1.0)
        # temperature flattening: small domain upweighted vs its share
        assert out["small"]["weight"] > out["small"]["share"]
        assert out["big"]["weight"] < out["big"]["share"]

    def test_alpha_one_is_identity(self, spark):
        df = spark.createDataFrame(
            [("a", 300), ("b", 700)], "d string, n long"
        )
        for r in P.domain_mix_weights(df, "d", "n", alpha=1.0).collect():
            assert r["weight"] == pytest.approx(r["share"])


class TestConnectedComponents:
    def test_chain_and_triangle_and_isolated_edge(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4),      # chain -> comp 1
             (10, 11), (11, 12), (10, 12),  # triangle -> comp 10
             (20, 21)],                   # pair -> comp 20
            "src long, dst long",
        )
        cc = {r["node"]: r["component"]
              for r in P.connected_components(edges).collect()}
        assert {cc[1], cc[2], cc[3], cc[4]} == {1}
        assert {cc[10], cc[11], cc[12]} == {10}
        assert {cc[20], cc[21]} == {20}

    def test_long_chain_converges(self, spark):
        n = 33
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "src long, dst long"
        )
        cc = P.connected_components(edges, max_iterations=50)
        comps = cc.select("component").distinct().collect()
        assert [r["component"] for r in comps] == [0]

    def test_self_loops_ignored(self, spark):
        edges = spark.createDataFrame(
            [(1, 1), (2, 3)], "src long, dst long"
        )
        nodes = {r["node"] for r in P.connected_components(edges).collect()}
        assert nodes == {2, 3}

    def test_long_path_converges_in_log_rounds(self, spark):
        # 200-node path: plain min-label propagation needs ~200 rounds;
        # pointer jumping must finish well inside 10.
        n = 200
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "src long, dst long"
        )
        cc = P.connected_components(edges, max_iterations=10)
        comps = cc.select("component").distinct().collect()
        assert [r["component"] for r in comps] == [0]
        assert cc.count() == n + 1

    def test_nonconvergence_raises_by_default(self, spark):
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            P.connected_components(edges, max_iterations=1)

    def test_nonconvergence_warn_returns_partial(self, spark):
        import warnings

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], "src long, dst long"
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = P.connected_components(
                edges, max_iterations=1, on_nonconvergence="warn"
            )
            assert out.count() == 41
        assert any("did not converge" in str(w.message) for w in caught)

    def test_bad_nonconvergence_mode(self, spark):
        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            P.connected_components(edges, on_nonconvergence="ignore")


class TestTfidfTopTerms:
    def test_scores_and_ranking(self, spark):
        from tumult_analytics_spark.operators.text import tfidf_top_terms
        import math

        df = spark.createDataFrame(
            [
                (1, "apple apple banana"),
                (2, "banana cherry"),
                (3, "cherry cherry cherry durian"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_top_terms(df, "text", "doc_id", k=2)
        rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
        # every doc has ranks 1..min(k, n_terms)
        assert (1, 1) in rows and (1, 2) in rows
        # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
        assert rows[(1, 1)]["term"] == "apple"
        idf_apple = math.log(4 / 2) + 1
        assert rows[(1, 1)]["score"] == pytest.approx(2 * idf_apple)
        assert rows[(1, 1)]["tf"] == 2 and rows[(1, 1)]["df_t"] == 1
        # doc 3: durian (tf=1, df=1) loses to cherry (tf=3, df=2)
        assert rows[(3, 1)]["term"] == "cherry"
        assert rows[(3, 2)]["term"] == "durian"

    def test_k_bounds_output(self, spark):
        from tumult_analytics_spark.operators.text import tfidf_top_terms

        df = spark.createDataFrame(
            [(1, "a b c d e f g h")], "doc_id long, text string"
        )
        assert tfidf_top_terms(df, "text", "doc_id", k=3).count() == 3


class TestPackSequences:
    def test_single_shard_layout(self, spark):
        # tokens: 4, 3, 5 laid out contiguously; seq_len 4 cuts at 4, 8.
        df = spark.createDataFrame(
            [(0, 4), (1, 3), (2, 5)], "doc_id long, n_tokens long"
        )
        out = {
            r["doc_id"]: r
            for r in P.pack_sequences(
                df, "n_tokens", seq_len=4, n_shards=1
            ).collect()
        }
        assert out[0]["start_offset"] == 0
        assert (out[0]["first_seq"], out[0]["last_seq"]) == (0, 0)
        assert not out[0]["spans_boundary"]
        # doc 1: offsets 4..6 -> seq 1 only
        assert out[1]["start_offset"] == 4
        assert (out[1]["first_seq"], out[1]["last_seq"]) == (1, 1)
        # doc 2: offsets 7..11 -> spans seqs 1..2
        assert out[2]["start_offset"] == 7
        assert (out[2]["first_seq"], out[2]["last_seq"]) == (1, 2)
        assert out[2]["spans_boundary"]

    def test_empty_doc_and_sharding(self, spark):
        df = spark.createDataFrame(
            [(0, 0), (1, 2), (2, 3), (3, 1)], "doc_id long, n_tokens long"
        )
        rows = P.pack_sequences(df, "n_tokens", seq_len=2, n_shards=2).collect()
        by_id = {r["doc_id"]: r for r in rows}
        # shard = doc_id % 2: shard 0 holds docs 0,2; shard 1 holds 1,3.
        assert by_id[0]["shard"] == 0 and by_id[2]["shard"] == 0
        assert by_id[1]["shard"] == 1 and by_id[3]["shard"] == 1
        # empty doc: zero-width, last_seq == first_seq, no span.
        assert by_id[0]["start_offset"] == 0
        assert by_id[0]["first_seq"] == by_id[0]["last_seq"] == 0
        assert not by_id[0]["spans_boundary"]
        # shard 1: doc 1 (2 toks) then doc 3 (1 tok) at offset 2.
        assert by_id[3]["start_offset"] == 2

    def test_total_sequences_accounting(self, spark):
        df = spark.createDataFrame(
            [(i, 7) for i in range(20)], "doc_id long, n_tokens long"
        )
        packed = P.pack_sequences(df, "n_tokens", seq_len=16, n_shards=4)
        per_shard = (
            packed.groupBy("shard")
            .agg(
                F.ceil(
                    F.max(F.col("start_offset") + F.col("n_tokens")) / 16
                ).alias("n_seqs")
            )
            .collect()
        )
        # 5 docs x 7 tokens = 35 tokens per shard -> ceil(35/16) = 3.
        assert sorted(r["n_seqs"] for r in per_shard) == [3, 3, 3, 3]

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, 1)], "doc_id long, n_tokens long")
        with pytest.raises(ValueError):
            P.pack_sequences(df, "n_tokens", seq_len=0)
        with pytest.raises(ValueError):
            P.pack_sequences(df, "n_tokens", seq_len=4, n_shards=0)


class TestSlidingChunks:
    def test_chunk_spans(self, spark):
        df = spark.createDataFrame(
            [(0, 10), (1, 3), (2, 4), (3, 0)], "doc_id long, n_tokens long"
        )
        out = P.sliding_chunks(df, "n_tokens", window=4, stride=3)
        rows = sorted(
            (r["doc_id"], r["chunk_start"], r["chunk_len"])
            for r in out.collect()
        )
        # doc 0 (10 toks): starts 0,3,6 len 4,4,4 — 6+4=10 reaches the end.
        # doc 1 (3 toks): one short chunk. doc 2 (4 toks): exactly one.
        # doc 3 (0 toks): none.
        assert rows == [
            (0, 0, 4), (0, 3, 4), (0, 6, 4),
            (1, 0, 3),
            (2, 0, 4),
        ]

    def test_full_coverage_invariant(self, spark):
        # Every token index is covered by at least one chunk.
        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate([1, 5, 8, 9, 17, 33])],
            "doc_id long, n_tokens long",
        )
        out = P.sliding_chunks(df, "n_tokens", window=8, stride=5)
        agg = (
            out.groupBy("doc_id", "n_tokens")
            .agg(
                F.max(F.col("chunk_start") + F.col("chunk_len")).alias("end"),
                F.count(F.lit(1)).alias("n_chunks"),
            )
            .collect()
        )
        for r in agg:
            assert r["end"] == r["n_tokens"]
            expect = 1 + max(0, -(-(r["n_tokens"] - 8) // 5))
            assert r["n_chunks"] == expect

    def test_no_shuffle_plan(self, spark):
        df = spark.createDataFrame(
            [(0, 10)], "doc_id long, n_tokens long"
        )
        plan = P.sliding_chunks(
            df, "n_tokens", window=4, stride=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestCapPerGroup:
    def test_cap_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(i, f"d{i % 3}") for i in range(100)], "k long, g string"
        )
        out = P.cap_per_group(df, "g", "k", max_rows=10)
        sizes = {r["g"]: r["n"] for r in
                 out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert all(n == 10 for n in sizes.values())
        # Deterministic: identical selection on a re-run.
        a = sorted(r["k"] for r in out.collect())
        b = sorted(
            r["k"] for r in P.cap_per_group(df, "g", "k", 10).collect()
        )
        assert a == b

    def test_small_groups_untouched(self, spark):
        df = spark.createDataFrame(
            [(i, "only") for i in range(5)], "k long, g string"
        )
        assert P.cap_per_group(df, "g", "k", max_rows=10).count() == 5

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "k long, g string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            P.cap_per_group(df, "g", "k", max_rows=0)


class TestExportShards:
    def test_round_trip_and_assignment(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(200)], "k long, v long"
        )
        back = P.export_shards(
            df, str(tmp_path / "out"), "k", n_shards=4, format="json"
        )
        assert back.count() == 200
        # Written shard dirs carry exactly the md5 assignment.
        expect = df.withColumn("shard", P.shard_id(F.col("k"), 4))
        diff = back.select("k", "shard").exceptAll(
            expect.select("k", "shard")
        )
        assert diff.count() == 0
        shards = {r["shard"] for r in back.select("shard").distinct().collect()}
        assert shards <= set(range(4))

    def test_parquet_format(self, spark, tmp_path):
        df = spark.createDataFrame([(i, f"t{i}") for i in range(20)],
                                   "k long, t string")
        back = P.export_shards(
            df, str(tmp_path / "pq"), "k", n_shards=2, format="parquet"
        )
        assert sorted(r["t"] for r in back.collect()) == sorted(
            f"t{i}" for i in range(20)
        )


class TestMixToTokenBudget:
    def test_rates_and_determinism(self, spark):
        rows = [(i, "a" if i < 60 else "b", 100) for i in range(100)]
        df = spark.createDataFrame(rows, "k long, d string, tok long")
        # budget 4000, w_a=0.5 -> rate_a = 2000/6000 = 1/3; w_b=0 -> drop.
        out = P.mix_to_token_budget(df, "d", "tok", "k", {"a": 0.5}, 4000)
        got = out.groupBy("d").count().collect()
        assert {r["d"] for r in got} == {"a"}
        n = got[0]["count"]
        assert 0 < n < 60
        again = P.mix_to_token_budget(
            df, "d", "tok", "k", {"a": 0.5}, 4000
        ).count()
        assert again == n

    def test_under_allocated_domain_keeps_all(self, spark):
        df = spark.createDataFrame(
            [(i, "a", 10) for i in range(20)], "k long, d string, tok long"
        )
        # budget*w = 10_000 >> 200 total tokens -> rate clamps to 1.
        out = P.mix_to_token_budget(df, "d", "tok", "k", {"a": 1.0}, 10_000)
        assert out.count() == 20

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a", 1)], "k long, d string, tok long")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            P.mix_to_token_budget(df, "d", "tok", "k", {"a": 1.0}, -1)


class TestQualityLogit:
    def test_logit_and_keep(self, spark):
        from tumult_analytics_spark.operators import text as X

        df = spark.createDataFrame(
            [
                (0, " ".join(["the quick brown fox jumps over a lazy dog"] * 5)),
                (1, "!!! ??? ... !!! ??? ... !!!"),
                (2, ""),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               X.quality_logit(df, "text").collect()}
        # Real sentence: positive logit; punctuation soup: negative.
        assert out[0]["keep"] is True and out[0]["logit"] > 0
        assert out[1]["keep"] is False and out[1]["logit"] < 0
        # Empty text: only the bias term.
        assert abs(out[2]["logit"] - (-1.0)) < 1e-12

    def test_pure_catalyst_plan(self, spark):
        from tumult_analytics_spark.operators import text as X

        df = spark.createDataFrame([(1, "hello world")],
                                   "doc_id long, text string")
        plan = (
            X.quality_logit(df, "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestQualityTrainLogreg:
    def _toy(self, spark):
        # Separable: long prose (label 1) vs short punctuation soup
        # (label 0) — the token-count feature alone separates them.
        good = " ".join(["a quick brown fox jumps over the lazy dog"] * 8)
        bad = "!!! ???"
        rows = [(i, good, 1.0) for i in range(12)] + [
            (100 + i, bad, 0.0) for i in range(12)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, label double"
        )

    def test_loss_decreases_and_weights_feed_inference(self, spark):
        from tumult_analytics_spark.operators import text as X

        df = self._toy(spark)
        hist = X.quality_train_logreg(
            df, "text", "label", steps=6, lr=4.0
        ).collect()
        mses = [r["mse"] for r in hist]
        assert mses[0] == pytest.approx(0.25)  # zero-init: s = 0.5
        assert mses[-1] < mses[0]
        assert all(b["mse"] <= a["mse"] + 1e-9
                   for a, b in zip(hist, hist[1:]))
        last = hist[-1]
        # Trained weights drop into the serving path and classify the
        # training set correctly.
        scored = X.quality_logit(
            df,
            "text",
            weights={
                "tokens_capped": last["w_tokens"],
                "mean_tok_capped": last["w_mean_tok"],
                "punct_ratio": last["w_punct"],
            },
            bias=last["bias"],
        ).collect()
        for r in scored:
            assert r["keep"] == (r["label"] == 1.0), r

    def test_step_one_matches_hand_gradient(self, spark):
        import numpy as np

        from tumult_analytics_spark.operators import text as X

        df = self._toy(spark)
        got = X.quality_train_logreg(df, "text", "label", steps=1).collect()[0]
        pdf = df.toPandas()
        nt = pdf["text"].str.split().str.len().to_numpy(dtype=float)
        nc = pdf["text"].str.len().to_numpy(dtype=float)
        npunct = pdf["text"].str.count(r"[!-/:-@\[-`{-~]").to_numpy(float)
        f = np.stack(
            [
                np.minimum(nt, 100) / 100.0,
                np.minimum(np.where(nt > 0, nc / nt, 0.0), 10.0) / 10.0,
                np.where(nc > 0, npunct / nc, 0.0),
            ]
        )
        y = pdf["label"].to_numpy(float)
        s = 0.5  # z = 0 at zero init
        e = s - y
        g = 2 * e * 0.5
        assert got["mse"] == pytest.approx(np.mean(e * e))
        assert got["bias"] == pytest.approx(-np.mean(g))
        for i, name in enumerate(["w_tokens", "w_mean_tok", "w_punct"]):
            assert got[name] == pytest.approx(-np.mean(g * f[i])), name

    def test_invalid_steps(self, spark):
        from tumult_analytics_spark.operators import text as X

        with pytest.raises(ValueError, match="steps"):
            X.quality_train_logreg(self._toy(spark), "text", "label", steps=0)

    def test_empty_input_rejected(self, spark):
        from tumult_analytics_spark.operators import text as X

        empty = self._toy(spark).filter("1 = 0")
        with pytest.raises(ValueError, match="empty training input"):
            X.quality_train_logreg(empty, "text", "label", steps=1)


class TestDedupSegments:
    def test_first_occurrence_wins_and_reassembly(self, spark):
        from tumult_analytics_spark.operators import dedup as D

        df = spark.createDataFrame(
            [
                (1, "a b c d"),       # segments (k=2): "a b", "c d"
                (2, "c d e f a b"),   # "c d" and "a b" already seen
                (3, ""),              # no segments at all
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["text_dedup"]
            for r in D.dedup_segments(df, "text", "doc_id", 2).collect()
        }
        assert out[1] == "a b c d"
        assert out[2] == "e f"
        assert out[3] == ""

    def test_position_ties_within_doc(self, spark):
        from tumult_analytics_spark.operators import dedup as D

        # The same segment twice within one document: only the earlier
        # position survives.
        df = spark.createDataFrame(
            [(7, "x y x y")], "doc_id long, text string"
        )
        out = D.dedup_segments(df, "text", "doc_id", 2).collect()[0]
        assert out["text_dedup"] == "x y"

    def test_short_tail_segment(self, spark):
        from tumult_analytics_spark.operators import dedup as D

        df = spark.createDataFrame(
            [(1, "p q r")], "doc_id long, text string"
        )
        out = D.dedup_segments(df, "text", "doc_id", 2).collect()[0]
        assert out["text_dedup"] == "p q r"

    def test_validation(self, spark):
        from tumult_analytics_spark.operators import dedup as D

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            D.dedup_segments(df, "text", "doc_id", 0)


class TestPiiRedact:
    def test_typed_placeholders_and_order(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail me at jo.doe+x@site.co or visit https://a.b/c?d=1"),
                (2, "card 1234567890123456 plain text"),
                (3, "nothing sensitive here"),
                (4, None),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["text_redacted"]
               for r in P.pii_redact(df, "text").collect()}
        assert out[1] == "mail me at <PII:email> or visit <PII:url>"
        assert out[2] == "card <PII:long_digits> plain text"
        assert out[3] == "nothing sensitive here"
        assert out[4] is None

    def test_custom_token_and_column(self, spark):
        df = spark.createDataFrame(
            [(1, "a@b.io")], "doc_id long, text string"
        )
        out = P.pii_redact(
            df, "text", output_column="clean", token="[{name}]"
        ).first()
        assert out["clean"] == "[email]"
        assert out["text"] == "a@b.io"  # original untouched


class TestClusterRepresentatives:
    def test_best_preference_survives(self, spark):
        docs = spark.createDataFrame(
            [(1, 10, "a"), (2, 99, "a"), (3, 50, "a"),
             (7, 5, "b"), (8, 5, "b"),
             (9, 42, "c")],  # singleton
            "doc_id long, quality long, lang string",
        )
        # {1,2,3} one cluster, {7,8} another, 9 alone.
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
        )
        kept = sorted(
            r["doc_id"]
            for r in P.cluster_representatives(
                docs, pairs, "doc_id", "quality"
            ).collect()
        )
        # 2 wins {1,2,3} on quality; 7 wins {7,8} on the id tie; 9 stays.
        assert kept == [2, 7, 9]

    def test_ascending_preference(self, spark):
        docs = spark.createDataFrame(
            [(1, 10), (2, 99)], "doc_id long, cost long"
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        kept = [
            r["doc_id"]
            for r in P.cluster_representatives(
                docs, pairs, "doc_id", "cost", ascending=True
            ).collect()
        ]
        assert kept == [1]

    def test_empty_pairs_keeps_everything(self, spark):
        docs = spark.createDataFrame(
            [(1, 10), (2, 20)], "doc_id long, q long"
        )
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        kept = P.cluster_representatives(docs, pairs, "doc_id", "q")
        assert kept.count() == 2


class TestNgramJaccardGuard:
    def test_over_limit_refused(self, spark):
        from tumult_analytics_spark.operators import dedup as D

        df = spark.createDataFrame(
            [(i, f"doc {i} text here") for i in range(5)],
            "doc_id long, text string",
        )
        with pytest.raises(ValueError, match="minhash_lsh_dedup"):
            D.ngram_jaccard_pairs(df, "text", "doc_id", max_rows=3)

    def test_explicit_override_runs(self, spark):
        from tumult_analytics_spark.operators import dedup as D

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),
                (2, "the quick brown fox jumps"),
                (3, "entirely different words instead"),
            ],
            "doc_id long, text string",
        )
        out = D.ngram_jaccard_pairs(
            df, "text", "doc_id", n=2, threshold=0.9, max_rows=3
        ).collect()
        assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


class TestTopNgrams:
    def test_counts_and_ties(self, spark):
        from tumult_analytics_spark.operators.text import top_ngrams

        df = spark.createDataFrame(
            [(1, "a b c a b c"), (2, "a b c d"), (3, "x")],
            "doc_id long, text string",
        )
        rows = top_ngrams(df, "text", n=3, k=10).collect()
        got = {(r["ngram"], r["count"], r["rank"]) for r in rows}
        # doc1 grams: "a b c","b c a","c a b","a b c"; doc2: "a b c","b c d"
        assert ("a b c", 3, 1) in got
        assert len(rows) == 4  # doc3 too short contributes nothing

    def test_validation(self, spark):
        from tumult_analytics_spark.operators.text import top_ngrams

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            top_ngrams(df, "text", n=0, k=5)


class TestCapPerGroupTwoPhase:
    def test_identical_output(self, spark):
        df = spark.createDataFrame(
            [(i, f"g{i % 4}") for i in range(400)], "k long, g string"
        ).repartition(8)
        a = sorted(
            (r["g"], r["k"])
            for r in P.cap_per_group(df, "g", "k", 7).collect()
        )
        b = sorted(
            (r["g"], r["k"])
            for r in P.cap_per_group(df, "g", "k", 7, two_phase=True).collect()
        )
        assert a == b and len(a) == 28

    def test_string_keys(self, spark):
        df = spark.createDataFrame(
            [(f"id{i}", "only") for i in range(50)], "k string, g string"
        ).repartition(4)
        a = sorted(r["k"] for r in P.cap_per_group(df, "g", "k", 5).collect())
        b = sorted(
            r["k"]
            for r in P.cap_per_group(df, "g", "k", 5, two_phase=True).collect()
        )
        assert a == b

    def test_null_group_keys_identical(self, spark):
        # A null group key is a real group: the window path partitions
        # all null-keyed rows together and keeps max_rows of them. The
        # two-phase pre-cap must do the same (pandas groupby dropna=False),
        # not silently drop them.
        rows = [(i, "g" if i % 5 else None) for i in range(60)]
        df = spark.createDataFrame(rows, "k long, g string").repartition(6)
        key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
        a = sorted(
            (
                (r["g"], r["k"])
                for r in P.cap_per_group(df, "g", "k", 8).collect()
            ),
            key=key,
        )
        b = sorted(
            (
                (r["g"], r["k"])
                for r in P.cap_per_group(
                    df, "g", "k", 8, two_phase=True
                ).collect()
            ),
            key=key,
        )
        assert a == b
        assert sum(1 for g, _ in b if g is None) == 8

    def test_null_key_values_identical(self, spark):
        # Null KEY values: Spark orders md5(NULL)=NULL first (NULLS
        # FIRST); the local kernel must mirror that, not hash str(None).
        rows = [(i if i % 7 else None, f"g{i % 3}") for i in range(60)]
        df = spark.createDataFrame(rows, "k long, g string").repartition(6)
        a = sorted(
            (r["g"], r["k"] if r["k"] is not None else -1)
            for r in P.cap_per_group(df, "g", "k", 6).collect()
        )
        b = sorted(
            (r["g"], r["k"] if r["k"] is not None else -1)
            for r in P.cap_per_group(df, "g", "k", 6, two_phase=True).collect()
        )
        assert a == b

    def test_local_cap_rank_is_catalyst_side(self, spark):
        # The pre-cap's md5 rank must be computed JVM-side BEFORE the
        # mapInPandas boundary: the analyzed plan of the kernel input
        # carries an md5 projection, and the kernel itself imports no
        # hashlib (sort/group/head only).
        import inspect

        df = spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(30)], "k long, g string"
        )
        capped = P._local_cap(df, ["g"], "k", 3)
        plan = capped._jdf.queryExecution().analyzed().toString()
        assert "md5" in plan.lower()
        assert "hashlib" not in inspect.getsource(P._local_cap)


class TestSplitDataset:
    def test_partition_and_stability(self, spark):
        df = spark.range(0, 3000).withColumnRenamed("id", "k")
        out = P.split_dataset(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == 3000
        assert abs(counts["train"] / 3000 - 0.8) < 0.05
        # Adding rows never moves an existing assignment.
        bigger = P.split_dataset(
            spark.range(0, 6000).withColumnRenamed("id", "k"),
            "k", {"train": 0.8, "val": 0.1, "test": 0.1},
        )
        a = {r["k"]: r["split"] for r in out.collect()}
        b = {r["k"]: r["split"] for r in bigger.collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_partial_fractions_leave_holdout(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "k")
        out = P.split_dataset(df, "k", {"train": 0.5})
        n_null = out.filter("split IS NULL").count()
        assert 0 < n_null < 500

    def test_validation(self, spark):
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            P.split_dataset(df, "k", {"a": 0.7, "b": 0.5})
        with pytest.raises(ValueError):
            P.split_dataset(df, "k", {})


class TestCrosscorpusDecontaminate:
    def test_near_dup_of_benchmark_dropped(self, spark):
        from tumult_analytics_spark.operators.dedup import (
            crosscorpus_decontaminate,
        )

        base = "the quick brown fox jumps over the lazy dog " * 6
        corpus = spark.createDataFrame(
            [
                (1, base),                       # exact copy of benchmark
                (2, base.replace("lazy", "idle")),  # near-dup
                (3, "completely different content about spark plans " * 6),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, base)], "doc_id long, text string"
        )
        kept = {
            r["doc_id"]
            for r in crosscorpus_decontaminate(
                corpus, bench, "text", "doc_id",
                min_signature_similarity=0.5,
            ).collect()
        }
        assert 1 not in kept
        assert 2 not in kept
        assert 3 in kept

    def test_benchmark_side_broadcast(self, spark):
        from tumult_analytics_spark.operators.dedup import (
            crosscorpus_decontaminate,
        )

        corpus = spark.createDataFrame(
            [(1, "aaaa bbbb cccc dddd")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(2, "eeee ffff gggg hhhh")], "doc_id long, text string"
        )
        plan = (
            crosscorpus_decontaminate(corpus, bench, "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestBloomContamination:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "a b c d e f"),   # shares grams with bench
                (2, "x y z w q r"),   # disjoint
                (3, "a b c d e"),     # fully contained in bench
                (4, "tiny"),          # < n tokens -> 0.0
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "a b c d e")], "doc_id long, text string"
        )
        return corpus, bench

    def test_no_false_negatives_and_huge_m_exact(self, spark):
        # With a huge filter the FP rate is ~0, so bloom == exact.
        corpus, bench = self._frames(spark)
        m, k = 1 << 30, 3
        bloom = P.bloom_filter_build(bench, "text", n=5, m_bits=m, k_hashes=k)
        out = {
            r["doc_id"]: r["bloom_hit_fraction"]
            for r in P.bloom_contamination(
                corpus, bloom, "text", "doc_id", n=5, m_bits=m, k_hashes=k
            ).collect()
        }
        assert out[1] == pytest.approx(0.5)
        assert out[2] == 0.0
        assert out[3] == pytest.approx(1.0)
        assert out[4] == 0.0

    def test_dense_filter_flags_everything(self, spark):
        # m=2 with any gram in bench sets both bits eventually -> every
        # corpus gram's positions are set (deterministic "false
        # positives" at saturation).
        corpus, bench = self._frames(spark)
        bloom = P.bloom_filter_build(bench, "text", n=5, m_bits=2, k_hashes=4)
        out = {
            r["doc_id"]: r["bloom_hit_fraction"]
            for r in P.bloom_contamination(
                corpus, bloom, "text", "doc_id", n=5, m_bits=2, k_hashes=4
            ).collect()
        }
        assert out[2] == pytest.approx(1.0)  # disjoint doc still flagged

    def test_plan_broadcasts_bloom(self, spark):
        corpus, bench = self._frames(spark)
        bloom = P.bloom_filter_build(bench, "text", n=5)
        plan = (
            P.bloom_contamination(corpus, bloom, "text", "doc_id", n=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark):
        _, bench = self._frames(spark)
        with pytest.raises(ValueError):
            P.bloom_filter_build(bench, "text", m_bits=1)
        with pytest.raises(ValueError):
            P.bloom_filter_build(bench, "text", k_hashes=0)


class TestLengthBucketedBatches:
    def test_buckets_batches_and_pad(self, spark):
        rows = [(i, n) for i, n in enumerate([5, 10, 20, 25, 30, 40, 70, 100])]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = P.length_bucketed_batches(
            df, "n_tokens", batch_size=2, bucket_edges=(16, 64), n_shards=1
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        # buckets: <16 -> 0, <64 -> 1, >=64 -> 2
        assert [by_id[i]["bucket"] for i in range(8)] == [0, 0, 1, 1, 1, 1, 2, 2]
        # bucket 1 in doc order: 20,25 | 30,40 -> two batches of 2
        b1 = sorted(
            (r["doc_id"], r["batch_id"], r["batch_pad"])
            for r in out if r["bucket"] == 1
        )
        assert b1 == [(2, 0, 5), (3, 0, 0), (4, 1, 10), (5, 1, 0)]

    def test_sharding_bounds_batch_members(self, spark):
        df = spark.createDataFrame(
            [(i, 10) for i in range(40)], "doc_id long, n_tokens long"
        )
        out = P.length_bucketed_batches(
            df, "n_tokens", batch_size=4, n_shards=4
        )
        sizes = (
            out.groupBy("shard", "bucket", "batch_id")
            .count().select("count").collect()
        )
        assert all(r["count"] <= 4 for r in sizes)
        assert out.select("shard").distinct().count() == 4

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
        with pytest.raises(ValueError):
            P.length_bucketed_batches(df, "n_tokens", batch_size=0)
        with pytest.raises(ValueError):
            P.length_bucketed_batches(
                df, "n_tokens", 2, bucket_edges=(64, 16)
            )


class TestWinnowFingerprints:
    def test_shared_substring_guarantee(self, spark):
        from tumult_analytics_spark.operators.text import winnow_fingerprints

        # winnowing guarantee: a shared substring of length >= k+w-1
        # (= 8 here) produces at least one shared fingerprint
        common = "zqxjwvkp"  # 8 chars, k=5 w=4
        df = spark.createDataFrame(
            [
                (1, "aaaa" + common + "bbbb"),
                (2, "cccc" + common + "dddd"),
                (3, "eeeeffffgggghhhh"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: set(r["fingerprints"])
            for r in winnow_fingerprints(df, "text", k=5, window=4).collect()
        }
        assert rows[1] & rows[2]
        assert not (rows[1] & rows[3] and rows[2] & rows[3])

    def test_short_and_null_docs(self, spark):
        from tumult_analytics_spark.operators.text import winnow_fingerprints

        df = spark.createDataFrame(
            [(1, "abcdefg"), (2, "ab"), (3, None)],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r["fingerprints"]
            for r in winnow_fingerprints(df, "text", k=5, window=4).collect()
        }
        assert rows[1] == []  # 3 grams < window -> empty
        assert rows[2] == [] and rows[3] is None

    def test_deterministic_and_sorted(self, spark):
        from tumult_analytics_spark.operators.text import winnow_fingerprints

        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        a = winnow_fingerprints(df, "text").collect()[0]["fingerprints"]
        b = winnow_fingerprints(df, "text").collect()[0]["fingerprints"]
        assert a == b == sorted(a) and len(a) == len(set(a))

    def test_validation(self, spark):
        import pytest as _pytest

        from tumult_analytics_spark.operators.text import winnow_fingerprints

        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            winnow_fingerprints(df, "text", k=0)


class TestHashedDocVectors:
    def test_signed_counts_and_empties(self, spark):
        from tumult_analytics_spark.operators.text import hashed_doc_vectors

        df = spark.createDataFrame(
            [(1, "a a b"), (2, ""), (3, None), (4, "   ")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r["doc_vec"]
            for r in hashed_doc_vectors(df, "text", dim=8).collect()
        }
        assert rows[3] is None
        assert rows[2] == [0] * 8 and rows[4] == [0] * 8
        v = rows[1]
        assert sum(abs(x) for x in v) in (1, 3)  # 'a'x2 and 'b', +-signs
        # same token always lands in the same slot with the same sign
        v2 = {
            r["doc_id"]: r["doc_vec"]
            for r in hashed_doc_vectors(df, "text", dim=8).collect()
        }[1]
        assert v == v2

    def test_feeds_kmeans(self, spark):
        from tumult_analytics_spark.operators.clustering import (
            kmeans_fit_predict,
        )
        from tumult_analytics_spark.operators.text import hashed_doc_vectors

        df = spark.createDataFrame(
            [(i, "alpha beta" if i % 2 else "gamma delta epsilon")
             for i in range(10)],
            "doc_id long, text string",
        )
        v = hashed_doc_vectors(df, "text", dim=16).withColumn(
            "emb", F.col("doc_vec").cast("array<float>")
        )
        out, _ = kmeans_fit_predict(
            v, vec_col="emb", id_col="doc_id", k=2, n_iter=3
        )
        clusters = {r["doc_id"]: r["cluster"] for r in out.collect()}
        evens = {clusters[i] for i in range(0, 10, 2)}
        odds = {clusters[i] for i in range(1, 10, 2)}
        assert len(evens) == 1 and len(odds) == 1 and evens != odds

    def test_validation(self, spark):
        from tumult_analytics_spark.operators.text import hashed_doc_vectors

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            hashed_doc_vectors(df, "text", dim=0)


class TestGopherQualityFlags:
    def test_rules_fire_individually(self, spark):
        good = "the cat and the dog have come to stay with all of us " * 5
        df = spark.createDataFrame(
            [
                (1, good),                               # passes all
                (2, "word " * 10),                       # too few words
                (3, ("x " * 60).strip()),                # mean len < 3, no stopwords
                (4, good.replace("cat", "####")),        # symbol soup
                (5, "\n".join("- item" for _ in range(20))),  # bullets
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in P.gopher_quality_flags(df, "text").collect()
        }
        assert rows[1]["gopher_pass"]
        assert not rows[2]["g_word_count_ok"]
        assert not rows[3]["g_mean_word_len_ok"]
        assert not rows[3]["g_stopword_ok"]
        assert not rows[4]["g_symbol_ratio_ok"]
        assert not rows[5]["g_bullet_ok"]
        assert all(not rows[i]["gopher_pass"] for i in (2, 3, 4, 5))

    def test_ellipsis_lines_rule(self, spark):
        text = "\n".join(
            ["the words go on and on..."] * 4 + ["a normal closing line"]
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = P.gopher_quality_flags(df, "text", min_words=1).collect()[0]
        assert not r["g_ellipsis_ok"]  # 4/5 lines end with ...

    def test_plan_is_shuffle_free(self, spark):
        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        plan = (
            P.gopher_quality_flags(df, "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestCanonicalizeUrls:
    def test_normalization_chain(self, spark):
        from tumult_analytics_spark.operators.text import canonicalize_urls

        df = spark.createDataFrame(
            [
                (1, "HTTPS://WWW.Example.COM/Path/?utm_source=x&id=2#frag"),
                (2, "http://example.com/path?id=2"),
                (3, "example.com/path/"),
                (4, "https://sub.example.org/a?utm_a=1&utm_b=2"),
                (5, "http://example.com/?utm_only=1"),
            ],
            "doc_id long, url string",
        )
        rows = {
            r["doc_id"]: (r["url_canon"], r["host"], r["registered_domain"])
            for r in canonicalize_urls(df, "url").collect()
        }
        assert rows[1] == ("example.com/path?id=2", "example.com", "example.com")
        assert rows[2] == ("example.com/path?id=2", "example.com", "example.com")
        assert rows[1][0] == rows[2][0]  # URL-level dedup key collides
        assert rows[3] == ("example.com/path", "example.com", "example.com")
        assert rows[4] == (
            "sub.example.org/a", "sub.example.org", "example.org",
        )
        assert rows[5] == ("example.com", "example.com", "example.com")

    def test_plan_shuffle_free(self, spark):
        from tumult_analytics_spark.operators.text import canonicalize_urls

        df = spark.createDataFrame([(1, "http://a.com")], "doc_id long, url string")
        plan = (
            canonicalize_urls(df, "url")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestBigramLm:
    def test_scores_and_short_docs(self, spark):
        import math

        from tumult_analytics_spark.operators.text import bigram_logprob_score

        df = spark.createDataFrame(
            [
                (1, "a b a b"),
                (2, "a b"),
                (3, "z"),      # < 2 tokens -> null
                (4, None),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r["lm2_nll"]
            for r in bigram_logprob_score(df, "text", "doc_id").collect()
        }
        assert rows[3] is None and rows[4] is None
        # hand-computed model: tokens a:3 b:3 z:1, N=7
        # bigrams: (a,b):3 (b,a):1  [doc1: ab,ba,ab; doc2: ab]
        def p(c2, c1p, c1c):
            return 0.7 * (c2 / c1p) + (1.0 - 0.7) * (c1c / 7.0)

        nll_ab = -math.log(p(3, 3, 3))
        nll_ba = -math.log(p(1, 3, 3))
        expect1 = round((nll_ab + nll_ba + nll_ab) / 3, 6)
        expect2 = round(nll_ab, 6)
        assert rows[1] == pytest.approx(expect1, abs=1e-6)
        assert rows[2] == pytest.approx(expect2, abs=1e-6)
        # repetitive doc scores better (lower) than the rare transition
        assert rows[1] < -math.log(p(1, 3, 3)) + 1e-9

    def test_validation(self, spark):
        from tumult_analytics_spark.operators.text import bigram_logprob_score

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bigram_logprob_score(df, "text", "doc_id", interp=1.5)


class TestCountMinSketch:
    def test_overestimate_never_underestimate(self, spark):
        vals = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]
        df = spark.createDataFrame([(v,) for v in vals], "tok string")
        # width=2 forces heavy collisions
        sk = P.cms_build(df, "tok", width=2, depth=2)
        est = {
            r["tok"]: r["cms_estimate"]
            for r in P.cms_estimate(
                sk, df.select("tok").distinct(), "tok", width=2, depth=2
            ).collect()
        }
        exact = {"a": 50, "b": 20, "c": 5, "d": 1}
        for t, c in exact.items():
            assert est[t] >= c
        # wide sketch: estimates exact
        sk2 = P.cms_build(df, "tok", width=4096, depth=3)
        est2 = {
            r["tok"]: r["cms_estimate"]
            for r in P.cms_estimate(
                sk2, df.select("tok").distinct(), "tok",
                width=4096, depth=3,
            ).collect()
        }
        assert est2 == exact

    def test_sketches_merge_by_addition(self, spark):
        a = spark.createDataFrame([("x",)] * 3 + [("y",)], "tok string")
        b = spark.createDataFrame([("x",)] * 2, "tok string")
        ska = P.cms_build(a, "tok", width=64, depth=2)
        skb = P.cms_build(b, "tok", width=64, depth=2)
        merged = (
            ska.unionByName(skb)
            .groupBy("d", "pos")
            .agg(F.sum("cnt").alias("cnt"))
        )
        both = a.unionByName(b)
        direct = P.cms_build(both, "tok", width=64, depth=2)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_sketch_size_bounded_and_unknown_zero(self, spark):
        df = spark.createDataFrame(
            [(str(i),) for i in range(500)], "tok string"
        )
        sk = P.cms_build(df, "tok", width=16, depth=2)
        assert sk.count() <= 32
        unknown = spark.createDataFrame([("zzz-not-seen",)], "tok string")
        # estimate for an unseen value may be a collision overestimate,
        # but with depth rows it is the MIN -> usually small; with an
        # empty sketch it must be exactly 0
        empty = P.cms_build(
            spark.createDataFrame([], "tok string"), "tok", 16, 2
        )
        est = P.cms_estimate(empty, unknown, "tok", 16, 2).collect()
        assert est[0]["cms_estimate"] == 0
        with pytest.raises(ValueError):
            P.cms_build(df, "tok", width=0)


class TestRecencyWeightedSample:
    def test_decay_and_floor(self, spark):
        rows = [
            (i, f"2024-02-{28 - (i % 28):02d} 00:00:00") for i in range(400)
        ]
        df = spark.createDataFrame(rows, "event_id long, ts string").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        kept_fast = P.recency_weighted_sample(
            df, F.col("ts"), "event_id", "2024-03-01 00:00:00",
            half_life_days=2.0,
        ).count()
        kept_slow = P.recency_weighted_sample(
            df, F.col("ts"), "event_id", "2024-03-01 00:00:00",
            half_life_days=30.0,
        ).count()
        assert kept_fast < kept_slow  # faster decay keeps fewer
        # floor keeps a trickle of even very old rows
        old = spark.createDataFrame(
            [(i, "2020-01-01 00:00:00") for i in range(3000)],
            "event_id long, ts string",
        ).select("event_id", F.col("ts").cast("timestamp").alias("ts"))
        kept_floor = P.recency_weighted_sample(
            old, F.col("ts"), "event_id", "2024-03-01 00:00:00",
            half_life_days=2.0, floor_rate=0.05,
        ).count()
        assert 0 < kept_floor < 600  # ~5%, deterministic

    def test_deterministic_and_validated(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-02-01 00:00:00")], "event_id long, ts string"
        ).select("event_id", F.col("ts").cast("timestamp").alias("ts"))
        a = P.recency_weighted_sample(
            df, F.col("ts"), "event_id", "2024-03-01 00:00:00", 14.0
        ).count()
        b = P.recency_weighted_sample(
            df, F.col("ts"), "event_id", "2024-03-01 00:00:00", 14.0
        ).count()
        assert a == b
        with pytest.raises(ValueError):
            P.recency_weighted_sample(
                df, F.col("ts"), "event_id", "2024-03-01", 0.0
            )


class TestSoftDedupWeights:
    def test_weights_by_component_size(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(6)], "doc_id long"
        )
        # components: {0,1,2} (chain), {3,4}; 5 is a singleton
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
        )
        w = {
            r["doc_id"]: r["dedup_weight"]
            for r in P.soft_dedup_weights(docs, pairs, "doc_id").collect()
        }
        third = 1.0 / 3.0
        assert w[0] == w[1] == w[2] == pytest.approx(third)
        assert w[3] == w[4] == pytest.approx(0.5)
        assert w[5] == 1.0
        # the effective corpus counts each component once
        assert sum(w.values()) == pytest.approx(3.0)

    def test_no_pairs_all_ones(self, spark):
        docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        w = P.soft_dedup_weights(docs, pairs, "doc_id").collect()
        assert all(r["dedup_weight"] == 1.0 for r in w)


class TestCharEntropy:
    def test_known_values(self, spark):
        import math

        from tumult_analytics_spark.operators.text import char_entropy

        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r["char_entropy"]
            for r in char_entropy(df, "text").collect()
        }
        assert rows[1] == 0.0
        assert rows[2] == pytest.approx(1.0)
        assert rows[3] == pytest.approx(2.0)
        assert rows[4] == 0.0 and rows[5] is None
        # natural-ish text sits between spam and uniform
        nat = char_entropy(
            spark.createDataFrame(
                [(1, "the quick brown fox jumps over the lazy dog")],
                "doc_id long, text string",
            ),
            "text",
        ).collect()[0]["char_entropy"]
        assert 3.0 < nat < 5.0


class TestDsir:
    """DSIR importance resampling (Xie et al. 2023): hashed-unigram
    importance weights between a target and the raw corpus, Gumbel
    top-k selection."""

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "quantum flux capacitor warp drive"),
                (3, "the dog sat on the rug"),
                (4, "stock market prices fell sharply today"),
            ],
            "doc_id long, text string",
        )

    def _target(self, spark):
        return spark.createDataFrame(
            [
                (100, "the cat and the dog sat together"),
                (101, "a cat on a mat and a dog on a rug"),
            ],
            "tid long, text string",
        )

    def test_target_like_docs_weigh_more(self, spark):
        from tumult_analytics_spark.operators.pipeline import dsir_log_weights

        w = dsir_log_weights(
            self._corpus(spark), self._target(spark), "text", "doc_id"
        )
        rows = {r["doc_id"]: r["dsir_logw"] for r in w.collect()}
        assert rows[1] > rows[2] and rows[1] > rows[4]
        assert rows[3] > rows[2] and rows[3] > rows[4]

    def test_empty_and_null_docs_are_neutral(self, spark):
        from tumult_analytics_spark.operators.pipeline import dsir_log_weights

        corpus = self._corpus(spark).unionByName(
            spark.createDataFrame(
                [(5, None), (6, "")], "doc_id long, text string"
            )
        )
        w = dsir_log_weights(corpus, self._target(spark), "text", "doc_id")
        rows = {r["doc_id"]: r["dsir_logw"] for r in w.collect()}
        assert rows[5] == 0.0 and rows[6] == 0.0
        assert len(rows) == 6  # no row lost or duplicated

    def test_low_temperature_resample_picks_target_like(self, spark):
        from tumult_analytics_spark.operators.pipeline import dsir_resample

        sel = dsir_resample(
            self._corpus(spark), self._target(spark), "text", "doc_id",
            n=2, temperature=0.05,
        )
        assert sorted(r["doc_id"] for r in sel.collect()) == [1, 3]
        ranks = {r["doc_id"]: r["dsir_rank"] for r in sel.collect()}
        assert set(ranks.values()) == {1, 2}

    def test_resample_deterministic_across_runs(self, spark):
        from tumult_analytics_spark.operators.pipeline import dsir_resample

        a = dsir_resample(
            self._corpus(spark), self._target(spark), "text", "doc_id", n=3
        )
        b = dsir_resample(
            self._corpus(spark), self._target(spark), "text", "doc_id", n=3
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        # Different salt -> (possibly) different Gumbel draws, never an error.
        c = dsir_resample(
            self._corpus(spark), self._target(spark), "text", "doc_id",
            n=3, salt="other",
        )
        assert c.count() == 3

    def test_validation(self, spark):
        import pytest as _pytest

        from tumult_analytics_spark.operators.pipeline import (
            dsir_log_weights,
            dsir_resample,
        )

        with _pytest.raises(ValueError):
            dsir_log_weights(
                self._corpus(spark), self._target(spark), "text", "doc_id",
                n_buckets=1,
            )
        with _pytest.raises(ValueError):
            dsir_resample(
                self._corpus(spark), self._target(spark), "text", "doc_id",
                n=0,
            )
        with _pytest.raises(ValueError):
            dsir_resample(
                self._corpus(spark), self._target(spark), "text", "doc_id",
                n=1, temperature=0,
            )


class TestWebdatasetExport:
    def test_round_trip_bytes_and_manifest(self, spark, docs, tmp_path):
        import io
        import tarfile

        path = str(tmp_path / "wds")
        manifest = P.export_webdataset(
            docs, path, "doc_id", {"txt": "text", "lang": "lang"},
            n_shards=2,
        ).collect()
        assert {r["shard"] for r in manifest} <= {0, 1}
        # Every non-null text byte survives; doc 4's .txt is skipped
        # (null member) but its .lang is present.
        total_txt = sum(r["txt_bytes"] for r in manifest)
        want_txt = sum(
            len(r["text"].encode()) for r in docs.collect() if r["text"]
            is not None
        )
        assert total_txt == want_txt
        n_files = sum(r["n_files"] for r in manifest)
        assert n_files == 7 + 6  # 7 lang members + 6 non-null texts
        # Extract one sample and compare content byte-for-byte.
        found = {}
        import glob

        for p in glob.glob(path + "/shard-*.tar"):
            with tarfile.open(p) as tar:
                for info in tar:
                    found[info.name] = tar.extractfile(info).read()
        assert found["2.txt"] == "uno dos tres cuatro cinco".encode()
        assert found["2.lang"] == b"es"
        assert "4.txt" not in found and found["4.lang"] == b"de"

    def test_deterministic_bytes_across_reruns(self, spark, docs, tmp_path):
        import hashlib

        def digest(d):
            import glob

            h = hashlib.md5()
            for p in sorted(glob.glob(str(d) + "/shard-*.tar")):
                h.update(open(p, "rb").read())
            return h.hexdigest()

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        P.export_webdataset(
            docs, a, "doc_id", {"txt": "text"}, n_shards=3
        ).collect()
        P.export_webdataset(
            docs.orderBy(F.rand(7)), b, "doc_id", {"txt": "text"},
            n_shards=3,
        ).collect()
        assert digest(a) == digest(b)  # input order cannot leak into bytes

    def test_manifest_fails_loudly_on_bad_path(self, spark, tmp_path):
        from tumult_analytics_spark.operators.pipeline import (
            read_webdataset_manifest,
        )

        # Unknown scheme: the fs seam resolve fails loudly, never a
        # silent empty manifest. (s3a://-family now genuinely resolves
        # through pyarrow.fs — graded in tests/test_fs.py via the
        # aliased mock scheme.)
        with pytest.raises(Exception, match="[Uu]nrecognized|scheme"):
            read_webdataset_manifest(spark, "nosuch://bucket/wds", ["txt"])
        # Local dir with no shards: error, never a silent empty manifest.
        empty = str(tmp_path / "nothing")
        import os as _os

        _os.makedirs(empty)
        with pytest.raises(FileNotFoundError, match="shard-"):
            read_webdataset_manifest(spark, empty, ["txt"])

    def test_binary_member(self, spark, tmp_path):
        rows = [(1, bytearray(b"\x00\xffPNG")), (2, bytearray(b"\x01\x02"))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        path = str(tmp_path / "bin")
        m = P.export_webdataset(
            df, path, "doc_id", {"png": "payload"}, n_shards=1
        ).collect()
        assert m[0]["png_bytes"] == 7  # 5 + 2 payload bytes
        import tarfile

        with tarfile.open(path + "/shard-00000.tar") as tar:
            assert tar.extractfile("1.png").read() == b"\x00\xffPNG"


class TestEpochShuffle:
    def test_positions_contiguous_and_reproducible(self, spark, docs):
        a = P.epoch_shuffle(docs, "doc_id", seed=3, n_shards=2).collect()
        b = P.epoch_shuffle(
            docs.orderBy(F.rand(9)), "doc_id", seed=3, n_shards=2
        ).collect()
        key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
        assert key(a) == key(b)  # input order cannot leak
        by_shard = {}
        for r in a:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for positions in by_shard.values():
            assert sorted(positions) == list(range(1, len(positions) + 1))

    def test_new_seed_new_permutation(self, spark, docs):
        a = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in P.epoch_shuffle(docs, "doc_id", seed=1).collect()
        }
        b = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in P.epoch_shuffle(docs, "doc_id", seed=2).collect()
        }
        assert a != b


class TestGreedyPack:
    def test_no_doc_split_and_capacity(self, spark):
        df = spark.createDataFrame(
            [(i, 100 + (i * 37) % 900) for i in range(200)],
            "doc_id long, n long",
        )
        out = P.pack_documents_greedy(
            df, "doc_id", "n", max_length=1024, n_shards=4, seed=2
        ).collect()
        assert len(out) == 200  # every doc exactly once
        by_seq = {}
        for r in out:
            by_seq.setdefault((r["shard"], r["seq"]), []).append(r)
        for rows in by_seq.values():
            total = sum(r["n"] for r in rows)
            if len(rows) > 1:
                assert total <= 1024  # multi-doc sequences never overflow
            # offsets are the running sum in offset order
            rows = sorted(rows, key=lambda r: r["seq_offset"])
            acc = 0
            for r in rows:
                assert r["seq_offset"] == acc
                acc += r["n"]

    def test_oversized_doc_gets_own_sequence(self, spark):
        df = spark.createDataFrame(
            [(1, 5000), (2, 100), (3, 100)], "doc_id long, n long"
        )
        out = P.pack_documents_greedy(
            df, "doc_id", "n", max_length=1024, n_shards=1, seed=0
        ).collect()
        seq_of = {r["doc_id"]: r["seq"] for r in out}
        # doc 1 shares a sequence with nobody
        assert sum(1 for r in out if r["seq"] == seq_of[1]) == 1

    def test_deterministic_vs_input_order(self, spark):
        df = spark.createDataFrame(
            [(i, 100 + i % 500) for i in range(300)], "doc_id long, n long"
        )
        a = {
            r["doc_id"]: (r["shard"], r["seq"], r["seq_offset"])
            for r in P.pack_documents_greedy(
                df, "doc_id", "n", 2048, n_shards=4, seed=5
            ).collect()
        }
        b = {
            r["doc_id"]: (r["shard"], r["seq"], r["seq_offset"])
            for r in P.pack_documents_greedy(
                df.orderBy(F.rand(1)), "doc_id", "n", 2048, n_shards=4, seed=5
            ).collect()
        }
        assert a == b


class TestCurriculumOrder:
    def test_tier_major_then_shuffled(self, spark):
        rows = [(i, i % 3) for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, tier int")
        out = P.curriculum_order(
            df, "doc_id", "tier", seed=2, n_shards=4
        ).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        for shard, rs in by_shard.items():
            rs.sort(key=lambda r: r["pos"])
            # positions contiguous from 1
            assert [r["pos"] for r in rs] == list(range(1, len(rs) + 1))
            # tiers non-decreasing along position
            tiers = [r["tier"] for r in rs]
            assert tiers == sorted(tiers)

    def test_same_seed_reproducible_new_seed_reshuffles_within_tier(
        self, spark
    ):
        rows = [(i, i % 2) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, tier int")

        def order(seed):
            return {
                r["doc_id"]: (r["shard"], r["pos"])
                for r in P.curriculum_order(
                    df, "doc_id", "tier", seed=seed, n_shards=2
                ).collect()
            }

        assert order(1) == order(1)
        a, b = order(1), order(2)
        assert a != b
        # tier precedence survives any seed: within a shard, every
        # tier-0 row sits before every tier-1 row
        for seed_map in (a, b):
            by_shard = {}
            for doc_id, (shard, pos) in seed_map.items():
                by_shard.setdefault(shard, []).append((pos, doc_id % 2))
            for rs in by_shard.values():
                rs.sort()
                tiers = [t for _, t in rs]
                assert tiers == sorted(tiers)

    def test_single_window_shuffle(self, spark):
        df = spark.createDataFrame(
            [(i, i % 3) for i in range(50)], "doc_id long, tier int"
        )
        plan = (
            P.curriculum_order(df, "doc_id", "tier", seed=0, n_shards=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange rangepartitioning" not in plan  # no global sort

    def test_rejects_bad_shards(self, spark):
        df = spark.createDataFrame([(1, 0)], "doc_id long, tier int")
        try:
            P.curriculum_order(df, "doc_id", "tier", n_shards=0)
        except ValueError:
            return
        raise AssertionError("n_shards=0 must raise")


class TestCorpusDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [
                (1, "a", "en"),
                (2, "b", "en"),
                (3, "c", "fr"),
                (4, None, "fr"),   # null payload
                (5, "<null>", "de"),  # literal sentinel text
            ],
            "doc_id long, text string, lang string",
        )
        new = spark.createDataFrame(
            [
                (1, "a", "en"),        # unchanged
                (2, "B", "en"),        # changed
                (4, "", "fr"),         # null -> empty string = changed
                (5, None, "de"),       # text -> null = changed
                (6, "new", "de"),      # added
            ],
            "doc_id long, text string, lang string",
        )
        return old, new

    def test_statuses(self, spark):
        old, new = self._frames(spark)
        out = {
            r["doc_id"]: r["status"]
            for r in P.corpus_diff(
                old, new, "doc_id", ["text"], carry_columns=["lang"]
            ).collect()
        }
        assert out == {
            1: "unchanged",
            2: "changed",
            3: "removed",
            4: "changed",
            5: "changed",
            6: "added",
        }

    def test_carry_columns_coalesce(self, spark):
        old, new = self._frames(spark)
        langs = {
            r["doc_id"]: r["lang"]
            for r in P.corpus_diff(
                old, new, "doc_id", ["text"], carry_columns=["lang"]
            ).collect()
        }
        assert langs[3] == "fr"  # removed row carries the old side
        assert langs[6] == "de"  # added row carries the new side

    def test_multi_column_compare(self, spark):
        old = spark.createDataFrame(
            [(1, "a", "s1")], "doc_id long, text string, source string"
        )
        new = spark.createDataFrame(
            [(1, "a", "s2")], "doc_id long, text string, source string"
        )
        out = P.corpus_diff(old, new, "doc_id", ["text", "source"]).collect()
        assert out[0]["status"] == "changed"

    def test_exchange_is_slim_no_payload(self, spark):
        # the shuffled row is (id, fingerprint, carry) — the document
        # text must be reduced map-side and never enter the exchange
        old = spark.createDataFrame(
            [(i, "x" * 100, "en") for i in range(50)],
            "doc_id long, text string, lang string",
        )
        new = spark.createDataFrame(
            [(i, "y" * 100, "en") for i in range(40)],
            "doc_id long, text string, lang string",
        )
        qe = P.corpus_diff(
            old, new, "doc_id", ["text"], carry_columns=["lang"]
        )._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        import re

        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "text" not in m.group(1)
        # and the exchange inputs project only id/fp/carry
        assert "__fp__" in plan

    def test_rejects_empty_compare(self, spark):
        old, new = self._frames(spark)
        try:
            P.corpus_diff(old, new, "doc_id", [])
        except ValueError:
            return
        raise AssertionError("empty compare_columns must raise")

    def test_fingerprint_injective_across_columns(self, spark):
        # Sentinel-bearing values must not collide across column
        # boundaries, and a literal value equal to any null sentinel
        # must differ from NULL (round-10 ADVICE fix: per-column md5
        # digests, then md5 of the joined fixed-width digests).
        schema = "doc_id long, a string, b string"
        cases = [
            # control-char boundary shift across columns
            (1, "x\u0002", "y", "x", "\u0002y"),
            # literal null-sentinel text vs actual NULL
            (2, "\u0001<null>", "z", None, "z"),
            (3, "<null>", "z", None, "z"),  # plain-literal vs NULL
        ]
        old = spark.createDataFrame(
            [(i, a, b) for i, a, b, _, _ in cases], schema
        )
        new = spark.createDataFrame(
            [(i, a2, b2) for i, _, _, a2, b2 in cases], schema
        )
        out = {
            r["doc_id"]: r["status"]
            for r in P.corpus_diff(old, new, "doc_id", ["a", "b"]).collect()
        }
        assert out == {1: "changed", 2: "changed", 3: "changed"}
