"""Property-based tests (hypothesis): the DP relational core at infinite
budget must agree with pandas on randomly generated tables and keysets.
The reference has no property tests (SURVEY §5); these close that gap.

Examples are kept small and few — each example runs real Spark jobs."""

import pandas as pd
from pyspark.sql import functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tumult_analytics_spark import (
    AddOneRow,
    KeySet,
    PureDPBudget,
    QueryBuilder,
    Session,
)

INF = PureDPBudget(float("inf"))

_GROUPS = ["a", "b", "c"]

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(_GROUPS + ["d"]),  # data may contain keys outside keyset
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_groupby_count_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows or [("a", 0)], "g string, x long")
    if not rows:
        df = df.filter("1 = 0")
    s = Session.from_dataframe(INF, "t", df, AddOneRow())
    ks = KeySet.from_dict({"g": _GROUPS})
    out = s.evaluate(QueryBuilder("t").groupby(ks).count(), INF)
    got = {r["g"]: r["count"] for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    expected = {
        g: int((pdf["g"] == g).sum()) if len(pdf) else 0 for g in _GROUPS
    }
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=rows_strategy,
    low=st.integers(min_value=-50, max_value=0),
    high=st.integers(min_value=1, max_value=50),
)
def test_clamped_sum_matches_pandas(spark, rows, low, high):
    df = spark.createDataFrame(rows or [("a", 0)], "g string, x long")
    if not rows:
        df = df.filter("1 = 0")
    s = Session.from_dataframe(INF, "t", df, AddOneRow())
    ks = KeySet.from_dict({"g": _GROUPS})
    out = s.evaluate(
        QueryBuilder("t").groupby(ks).sum("x", low, high, name="s"), INF
    )
    got = {r["g"]: r["s"] for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    expected = {}
    for g in _GROUPS:
        sub = pdf[pdf["g"] == g]["x"].clip(low, high) if len(pdf) else []
        expected[g] = int(pd.Series(sub).sum()) if len(sub) else 0
    assert got == expected


_WORDS = ["aa", "bb", "cc", "dd"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_dedup_segments_invariants(spark, texts):
    from tumult_analytics_spark.operators.dedup import dedup_segments

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = dedup_segments(df, "text", "doc_id", seg_tokens=3).collect()
    k = 3
    segments = {}
    for i, t in enumerate(texts):
        toks = t.split()
        segs = [
            " ".join(toks[j : j + k]) for j in range(0, len(toks), k)
        ]
        for pos, s in enumerate(segs):
            segments.setdefault(s, (i, pos))
    for r in sorted(out, key=lambda r: r["doc_id"]):
        toks = texts[r["doc_id"]].split()
        segs = [
            " ".join(toks[j : j + k]) for j in range(0, len(toks), k)
        ]
        expect = " ".join(
            s for pos, s in enumerate(segs)
            if segments[s] == (r["doc_id"], pos)
        )
        # Every document keeps exactly its globally-first segments, in
        # original order.
        assert r["text_dedup"] == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=15), min_size=1, max_size=4
    ),
    cap=st.integers(min_value=1, max_value=6),
)
def test_cap_per_group_sizes(spark, sizes, cap):
    from tumult_analytics_spark.operators.pipeline import cap_per_group

    rows = [
        (g * 1000 + i, f"g{g}")
        for g, n in enumerate(sizes)
        for i in range(n)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "k long, g string")
    out = cap_per_group(df, "g", "k", cap)
    got = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    for g, n in enumerate(sizes):
        assert got.get(f"g{g}", 0) == min(n, cap)


class TestUrlCanonIdempotent:
    def test_canonicalization_is_idempotent(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tumult_analytics_spark.operators.text import canonicalize_urls

        host = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,3}){1,2}", fullmatch=True)
        path = st.from_regex(r"(/[a-z0-9]{0,6}){0,3}/?", fullmatch=True)
        query = st.one_of(
            st.just(""),
            st.from_regex(
                r"\?(utm_[a-z]{1,5}=[a-z0-9]{0,4}&?|id=[0-9]{1,3}&?){1,3}",
                fullmatch=True,
            ),
        )
        scheme = st.sampled_from(["", "http://", "https://", "HTTPS://www."])

        @settings(max_examples=30, deadline=None)
        @given(s=scheme, h=host, p=path, q=query)
        def run(s, h, p, q):
            url = s + h + p + q
            df = spark.createDataFrame([(1, url)], "doc_id long, url string")
            once = canonicalize_urls(df, "url").collect()[0]["url_canon"]
            df2 = spark.createDataFrame(
                [(1, once)], "doc_id long, url string"
            )
            twice = canonicalize_urls(df2, "url").collect()[0]["url_canon"]
            assert twice == once, (url, once, twice)

        run()


class TestBloomNoFalseNegatives:
    def test_every_benchmark_gram_is_flagged(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tumult_analytics_spark.operators.pipeline import (
            bloom_contamination,
            bloom_filter_build,
        )

        words = st.lists(
            st.from_regex(r"[a-z]{1,4}", fullmatch=True),
            min_size=3, max_size=8,
        )

        @settings(max_examples=10, deadline=None)
        @given(ws=words)
        def run(ws):
            text = " ".join(ws)
            bench = spark.createDataFrame(
                [(1, text)], "doc_id long, text string"
            )
            # a doc IN the benchmark must always be fully flagged,
            # whatever the filter size (no false negatives, ever)
            bloom = bloom_filter_build(
                bench, "text", n=3, m_bits=64, k_hashes=3
            )
            out = bloom_contamination(
                bench, bloom, "text", "doc_id", n=3, m_bits=64, k_hashes=3
            ).collect()[0]
            assert out["bloom_hit_fraction"] == 1.0

        run()


# --- substring dedup invariants (round 4) ----------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "omega", "kappa"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(word_lists=docs_strategy)
def test_substring_dedup_invariants(spark, word_lists):
    """Keep-first soundness on random word-salad docs: (1) the
    smallest-id doc is never modified; (2) removed chars only ever
    shrink a doc (never grow/reorder the survivors: text_dedup is a
    subsequence of text); (3) a doc with no >= L overlap with any
    smaller-id doc is untouched (checked via brute force)."""
    from tumult_analytics_spark.operators.dedup import substring_dedup

    L = 12
    texts = [" ".join(ws) for ws in word_lists]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in substring_dedup(df, "text", "doc_id", min_length=L).collect()
    }
    assert out[0] == texts[0]  # owner of everything it contains

    def shares_span(a: str, b: str) -> bool:
        for i in range(len(a) - L + 1):
            if a[i : i + L] in b:
                return True
        return False

    for i, t in enumerate(texts):
        cleaned = out[i]
        # Subsequence check: removal only deletes characters.
        it = iter(t)
        assert all(ch in it for ch in cleaned), (t, cleaned)
        if not any(shares_span(t, texts[j]) for j in range(i)):
            assert cleaned == t


# --- session-4 operators -----------------------------------------------------

_word = st.text(alphabet="abcd", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=25).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus_texts=st.lists(_doc, min_size=1, max_size=8),
    bench_texts=st.lists(_doc, min_size=1, max_size=3),
)
def test_decontaminate_matches_python_reference(
    spark, corpus_texts, bench_texts
):
    """Every cut span arithmetic matches a brute-force python oracle:
    position p of doc d is removed iff the L-gram at p appears verbatim
    in some benchmark text."""
    from tumult_analytics_spark.operators.dedup import (
        decontaminate_substrings,
    )

    L = 8
    corpus = spark.createDataFrame(
        list(enumerate(corpus_texts)), "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(bench_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["out"]
        for r in decontaminate_substrings(
            corpus, bench, "text", "doc_id", min_length=L,
            output_column="out",
        ).collect()
    }
    bench_grams = {
        t[p : p + L]
        for t in bench_texts
        for p in range(max(len(t) - L + 1, 0))
    }

    def py_clean(t):
        flagged = [
            p for p in range(max(len(t) - L + 1, 0))
            if t[p : p + L] in bench_grams
        ]
        covered = set()
        for p in flagged:
            covered.update(range(p, p + L))
        # span merge: gaps > L between flagged starts break spans, but
        # coverage semantics are identical to "every flagged gram's
        # characters are removed" because span ends extend L-1 past the
        # last start — so the union of covered positions IS the cut.
        return "".join(ch for i, ch in enumerate(t) if i not in covered)

    for i, t in enumerate(corpus_texts):
        assert got[i] == py_clean(t), (i, t)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=600), min_size=1,
                  max_size=40),
    cap=st.integers(min_value=200, max_value=1000),
)
def test_greedy_pack_invariants(spark, lens, cap):
    from tumult_analytics_spark.operators.pipeline import (
        pack_documents_greedy,
    )

    df = spark.createDataFrame(
        list(enumerate(lens)), "doc_id long, n long"
    )
    rows = pack_documents_greedy(
        df, "doc_id", "n", max_length=cap, n_shards=2, seed=3
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(range(len(lens)))
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq"]), []).append(r)
    for members in by_seq.values():
        if len(members) > 1:
            assert sum(m["n"] for m in members) <= cap
        offs = sorted(m["seq_offset"] for m in members)
        assert offs[0] == 0  # every sequence starts at offset 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=150, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
def test_quantile_sketch_error_bound(spark, vals):
    """Any rollup quantile is within one bin width of the exact
    inverted-CDF quantile of the CLAMPED data."""
    import numpy as np

    from tumult_analytics_spark.sources.readers import (
        build_quantile_sketches,
        rollup_quantiles,
    )

    bins, lo, hi = 20, 0.0, 100.0
    df = spark.createDataFrame(
        [("g", i % 3, float(v)) for i, v in enumerate(vals)],
        "g string, sub int, v double",
    )
    sk = build_quantile_sketches(df, ["g", "sub"], "v", lo, hi, bins=bins)
    for q in (0.1, 0.5, 0.9):
        got = rollup_quantiles(
            sk, ["g"], (q,), lo, hi, bins=bins,
        ).first()[f"q{q}".replace(".", "_")]
        clamped = np.clip(np.array(vals), lo, hi)
        exact = np.quantile(clamped, q, method="inverted_cdf")
        assert abs(got - exact) <= (hi - lo) / bins + 1e-9
