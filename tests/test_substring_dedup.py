"""Exact substring dedup (Lee et al. 2022 family): injected shared
spans >= min_length are found and cut with keep-first semantics;
shorter overlaps survive."""

import pytest

from tumult_analytics_spark.operators import dedup as D

SH = "XXXXXXXXXXYYYYYYYYYYZZZZZ"  # 25 chars


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_found_and_owner_keeps(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha " + SH + " omega"),
            (2, "prefix2 " + SH + " suffix2"),
            (3, "totally unrelated content here ok"),
        ],
    )
    spans = D.substring_duplicate_spans(docs, "text", "doc_id", min_length=20)
    rows = {(r["doc_id"], r["span_start"], r["span_end"]) for r in spans.collect()}
    # Only doc 2 is flagged (doc 1 is the smaller-id owner); the span is
    # the MAXIMAL shared run — including the spaces both docs share
    # around SH: " XXXX...ZZZZZ " = positions 8..34 of doc 2.
    assert rows == {(2, 8, 34)}


def test_short_overlap_survives(spark):
    docs = _docs(
        spark,
        [
            (1, "one fragment " + SH[:15] + " here"),
            (2, "other place " + SH[:15] + " there"),
        ],
    )
    # Shared run is 17 chars (15 + surrounding spaces) < min_length=20.
    spans = D.substring_duplicate_spans(docs, "text", "doc_id", min_length=20)
    assert spans.count() == 0
    out = D.substring_dedup(docs, "text", "doc_id", min_length=20)
    assert all(r["text_dedup"] == r["text"] for r in out.collect())


def test_cut_merges_overlapping_coverage(spark):
    # Two copies in one doc, fully-duplicated doc becomes empty.
    docs = _docs(
        spark,
        [
            (1, "alpha " + SH + " omega"),
            (4, SH),
            (5, "two " + SH + " mid " + SH + " end"),
        ],
    )
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in D.substring_dedup(docs, "text", "doc_id", min_length=20).collect()
    }
    assert out[1] == "alpha " + SH + " omega"  # owner untouched
    assert out[4] == ""  # fully duplicated
    assert out[5] == "twomidend"  # both copies + shared spaces cut


def test_same_doc_internal_repeat_not_flagged(spark):
    docs = _docs(spark, [(7, SH + " filler " + SH)])
    spans = D.substring_duplicate_spans(docs, "text", "doc_id", min_length=20)
    assert spans.count() == 0


def test_min_length_validation(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        D.substring_duplicate_spans(docs, "text", "doc_id", min_length=1)


def test_short_docs_and_nulls(spark):
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, None), (3, "also small")],
        "doc_id long, text string",
    )
    spans = D.substring_duplicate_spans(docs, "text", "doc_id", min_length=20)
    assert spans.count() == 0
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in D.substring_dedup(docs, "text", "doc_id", min_length=20).collect()
    }
    assert out[1] == "tiny" and out[2] is None and out[3] == "also small"


def test_winnow_prefilter_identical_results(spark):
    # Winnow guarantee: any pair sharing a span >= L shares a selected
    # fingerprint, so prefiltered results must be BYTE-identical to the
    # direct path — on real data, not just toys.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    direct = D.substring_dedup(docs, "text", "doc_id", min_length=50)
    pre = D.substring_dedup(
        docs, "text", "doc_id", min_length=50, prefilter_winnow=True
    )
    a = sorted((r["doc_id"], r["text_dedup"]) for r in direct.collect())
    b = sorted((r["doc_id"], r["text_dedup"]) for r in pre.collect())
    assert a == b


def test_candidate_set_is_sound_and_small(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cands = {
        r["doc_id"]
        for r in D.substring_candidate_ids(
            docs, "text", "doc_id", 50
        ).collect()
    }
    spans = D.substring_duplicate_spans(docs, "text", "doc_id", min_length=50)
    flagged = {r["doc_id"] for r in spans.collect()}
    # Soundness: every doc with an actual duplicated span is a candidate.
    assert flagged <= cands
    # Usefulness: the prefilter actually excludes most of the corpus.
    assert len(cands) < docs.count() / 2


# --- cross-corpus span decontamination --------------------------------------

BENCH_Q = "WHATXISXTHEXCAPITALXOFXFRANCEXANSWERXPARIS"  # 42 chars


def test_decontaminate_cuts_benchmark_quote(spark):
    corpus = _docs(
        spark,
        [
            (1, "intro " + BENCH_Q + " outro"),
            (2, "clean document with original prose only"),
            (3, BENCH_Q),  # doc that IS the benchmark text
        ],
    )
    bench = _docs(spark, [(100, "header " + BENCH_Q + " footer")])
    out = {
        r["doc_id"]: r["text_decontaminated"]
        for r in D.decontaminate_substrings(
            corpus, bench, "text", "doc_id", min_length=30
        ).collect()
    }
    # The maximal shared run includes the flanking spaces (benchmark
    # text also has spaces around the quote), so both spaces go too.
    assert out[1] == "introoutro"  # quote gone, own prose kept
    assert out[2] == "clean document with original prose only"
    assert out[3] == ""  # entirely benchmark text -> empty


def test_decontaminate_short_overlap_survives(spark):
    corpus = _docs(spark, [(1, "mentions " + BENCH_Q[:20] + " briefly")])
    bench = _docs(spark, [(100, BENCH_Q)])
    spans = D.decontaminate_spans(corpus, bench, "text", "doc_id", min_length=30)
    assert spans.count() == 0


def test_decontaminate_no_keep_first(spark):
    # Unlike self-dedup, EVERY doc containing benchmark text is cut —
    # there is no smaller-id owner that keeps its copy.
    corpus = _docs(
        spark,
        [(1, "a " + BENCH_Q + " b"), (2, "c " + BENCH_Q + " d")],
    )
    bench = _docs(spark, [(100, BENCH_Q)])
    spans = D.decontaminate_spans(corpus, bench, "text", "doc_id", min_length=30)
    assert {r["doc_id"] for r in spans.collect()} == {1, 2}


def test_decontaminate_winnow_prefilter_equivalence(spark):
    corpus = _docs(
        spark,
        [
            (1, "intro " + BENCH_Q + " outro"),
            (2, "clean document with original prose only"),
            (3, "also clean and also fully original text"),
            (4, BENCH_Q + " trailing commentary of its own"),
        ],
    )
    bench = _docs(spark, [(100, "x " + BENCH_Q + " y")])
    plain = D.decontaminate_substrings(
        corpus, bench, "text", "doc_id", min_length=30
    )
    pre = D.decontaminate_substrings(
        corpus, bench, "text", "doc_id", min_length=30, prefilter_winnow=True
    )
    assert sorted(
        (r["doc_id"], r["text_decontaminated"]) for r in plain.collect()
    ) == sorted((r["doc_id"], r["text_decontaminated"]) for r in pre.collect())


def test_decontaminate_benchmark_text_column_name(spark):
    corpus = _docs(spark, [(1, "quoting " + BENCH_Q + " here")])
    bench = spark.createDataFrame(
        [(9, BENCH_Q)], "bid long, question string"
    )
    out = D.decontaminate_substrings(
        corpus, bench, "text", "doc_id", min_length=30,
        benchmark_text_column="question",
    ).collect()
    assert out[0]["text_decontaminated"] == "quoting  here"


def test_span_candidates_collected_set_matches_join_path(spark, monkeypatch):
    # The collected-benchmark-set prefilter must produce exactly the
    # candidate ids of the explode + broadcast-semi-join shape it
    # replaces (same values probed against the same set).
    corpus = _docs(
        spark,
        [
            (1, "intro " + BENCH_Q + " outro"),
            (2, "clean document with original prose only"),
            (3, "also clean and also fully original text"),
            (4, BENCH_Q + " trailing commentary of its own"),
            (5, None),
            (6, "tiny"),
        ],
    )
    bench = _docs(spark, [(100, "x " + BENCH_Q + " y")])
    fast = D.decontaminate_span_candidates(
        corpus, bench, "text", "doc_id", 30, "text"
    )
    monkeypatch.setattr(D, "_BENCH_FP_COLLECT_CAP", 0)  # force join path
    slow = D.decontaminate_span_candidates(
        corpus, bench, "text", "doc_id", 30, "text"
    )
    assert sorted(r["doc_id"] for r in fast.collect()) == sorted(
        r["doc_id"] for r in slow.collect()
    )
