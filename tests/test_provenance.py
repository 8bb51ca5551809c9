"""Pipeline provenance: bitmask marking, duplicate attribution, and
funnel semantics (lowest-set-bit attribution, cumulative survival)."""

import pytest
from pyspark.sql import functions as F

from tumult_analytics_spark.operators import provenance as PR


@pytest.fixture()
def docs(spark):
    # (id, text): 1 short, 2+3 duplicates, 4 long, 5 short AND dup of 1
    rows = [
        (1, "tiny"),
        (2, "a perfectly fine doc"),
        (3, "a perfectly fine doc"),
        (4, "x" * 50),
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMarking:
    def test_mark_stage_bits_and_nulls(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 99)], "id long, v int"
        )
        out = PR.mark_stage(df, 0, F.col("v") > 50)
        out = PR.mark_stage(out, 3, F.col("v") < 20)
        got = {r["id"]: r["stage_flags"] for r in out.collect()}
        assert got == {1: 8, 2: 0, 3: 1}  # null condition -> not dropped

    def test_mark_duplicates_attribution(self, docs):
        out = PR.mark_duplicates(docs, ["text"], "doc_id", 1)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[2]["dup_of"] is None  # keeper (min id in group)
        assert rows[3]["dup_of"] == 2 and rows[3]["stage_flags"] == 2
        assert rows[5]["dup_of"] == 1 and rows[5]["stage_flags"] == 2
        assert rows[1]["dup_of"] is None and rows[4]["dup_of"] is None
        # surviving set (flags = 0) identical to drop-mode dedup_exact
        from tumult_analytics_spark.operators.dedup import dedup_exact

        kept = {r["doc_id"] for r in out.filter("stage_flags = 0").collect()}
        want = {r["doc_id"] for r in dedup_exact(docs, ["text"]).collect()}
        assert kept == want

    def test_bit_range_guard(self, docs):
        with pytest.raises(ValueError, match="bit"):
            PR.mark_stage(docs, 62, F.lit(True))
        with pytest.raises(ValueError, match="bit"):
            PR.mark_duplicates(docs, ["text"], "doc_id", -1)


class TestFunnel:
    def test_lowest_bit_attribution_and_survival(self, docs):
        # stage 0: too short (<10 chars) -> docs 1, 5
        # stage 1: too long (>40 chars)  -> doc 4
        # stage 2: duplicate             -> docs 3 and 5; 5 is already
        #   dead at stage 0, so it must NOT count at stage 2
        f = PR.mark_stage(docs, 0, F.length("text") < 10)
        f = PR.mark_stage(f, 1, F.length("text") > 40)
        f = PR.mark_duplicates(f, ["text"], "doc_id", 2)
        got = {
            r["stage_name"]: (r["n_dropped_here"], r["n_remaining"])
            for r in PR.provenance_funnel(
                f, ["short", "long", "dup"]
            ).collect()
        }
        assert got == {
            "short": (2, 3),
            "long": (1, 2),
            "dup": (1, 1),  # only doc 3; doc 5 attributed to 'short'
        }

    def test_funnel_guards(self, docs):
        f = PR.mark_stage(docs, 0, F.lit(False))
        with pytest.raises(ValueError, match="non-empty"):
            PR.provenance_funnel(f, [])
        with pytest.raises(ValueError, match="61"):
            PR.provenance_funnel(f, ["s"] * 62)

    def test_zero_overhead_when_not_requested(self, docs):
        # The un-instrumented frame has no provenance column and an
        # identical plan — instrumentation is strictly opt-in.
        assert "stage_flags" not in docs.columns
        plain = docs.filter(F.length("text") >= 10)
        assert "stage_flags" not in plain.columns
