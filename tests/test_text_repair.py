"""fix_mojibake unit tests: byte-exact inversion of both mojibake
flavors, false-positive safety on clean/trap/CJK text, multi-pass
convergence, and the pure-Catalyst plan contract."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tumult_analytics_spark.operators.text import (
    CP1252_CONTROL,
    CP1252_PRINTABLE,
    fix_mojibake,
)

ORIG = 'Café “quote”—\nend €9 naïve\tfaçade'


def _cp_dec(b):
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return None


def _whatwg_1252(bs: bytes) -> str:
    """WHATWG windows-1252 decode: cp1252 printables, C1 controls for
    the five undefined bytes — what browsers/crawlers actually apply."""
    return "".join(_cp_dec(b) or chr(b) for b in bs)


def test_cp1252_table_matches_python_codec():
    assert len(CP1252_PRINTABLE) == 27
    assert len(CP1252_CONTROL) == 27
    for printable, control in zip(CP1252_PRINTABLE, CP1252_CONTROL):
        assert printable == bytes([ord(control)]).decode("cp1252")
        assert 0x80 <= ord(control) < 0xA0


def test_repairs_whatwg_and_latin1_mojibake(spark):
    moji_1252 = _whatwg_1252(ORIG.encode("utf-8"))
    moji_latin = ORIG.encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [("w", moji_1252), ("l", moji_latin)], ["k", "t"]
    )
    out = {
        r.k: (r.text_fixed, r.rep)
        for r in fix_mojibake(df, "t", flag_column="rep").collect()
    }
    assert out["w"] == (ORIG, True)
    assert out["l"] == (ORIG, True)


def test_clean_and_trap_rows_survive_untouched(spark):
    rows = [
        ("clean", ORIG),                 # real UTF-8 with high chars
        ("euro", "€100 fine"),           # clean cp1252-printable
        ("trap", "price Ã 10"),          # mojibake-shaped, invalid UTF-8
        ("ascii", "plain text"),
        ("cjk", "漢字 text Ã©"),          # >U+00FF chars block repair
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, ["k", "t"])
    out = fix_mojibake(df, "t", flag_column="rep").collect()
    for r in out:
        assert r.text_fixed == r.t, r.k
        assert not r.rep, r.k


def test_double_mojibake_needs_two_passes(spark):
    moji1 = _whatwg_1252(ORIG.encode("utf-8"))
    moji2 = _whatwg_1252(moji1.encode("utf-8"))
    df = spark.createDataFrame([(moji2,)], ["t"])
    one = fix_mojibake(df, "t", passes=1).collect()[0].text_fixed
    two = fix_mojibake(df, "t", passes=2).collect()[0].text_fixed
    assert one == moji1
    assert two == ORIG
    # convergence: extra passes after full repair are no-ops
    three = fix_mojibake(df, "t", passes=3).collect()[0].text_fixed
    assert three == ORIG


def test_newlines_and_tabs_do_not_block_repair(spark):
    # regression: the latin-1-encodability gate must allow control
    # chars (real text has \n/\t), not just printables
    moji = _whatwg_1252("line—one\nline—two\ttab".encode("utf-8"))
    df = spark.createDataFrame([(moji,)], ["t"])
    assert (
        fix_mojibake(df, "t").collect()[0].text_fixed
        == "line—one\nline—two\ttab"
    )


def test_plan_is_pure_catalyst(spark):
    df = spark.createDataFrame([("x",)], ["t"])
    plan = (
        fix_mojibake(df, "t", passes=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_null_text_flag_is_false_not_null(spark):
    # rlike(NULL) is NULL, so an unguarded flag propagates NULL for
    # NULL text rows; consumers that group by or count the flag need a
    # real False (round-10 ADVICE fix).
    df = spark.createDataFrame(
        [(1, None), (2, "CafÃ©"), (3, "clean")],
        "id long, t string",
    )
    rows = {
        r["id"]: r["repaired"]
        for r in fix_mojibake(
            df, "t", output_column="o", flag_column="repaired"
        ).collect()
    }
    assert rows[1] is False
    assert rows[2] is True
    assert rows[3] is False


def test_invalid_passes_rejected(spark):
    df = spark.createDataFrame([("x",)], ["t"])
    try:
        fix_mojibake(df, "t", passes=0)
    except ValueError:
        return
    raise AssertionError("passes=0 must raise")
