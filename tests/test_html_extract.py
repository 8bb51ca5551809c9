"""HTML -> text extraction: hand cases, a pure-Python reference oracle
over fuzzed malformed markup, and the C4 line filter semantics."""

import random
import re

import pytest

from tumult_analytics_spark.operators import text as X


def _py_extract(s: str, entities: str = "core") -> str:
    """Reference implementation of html_extract's exact chain using
    Python's `re` (a third regex engine besides Java and RE2 — the
    chain is engine-portable by design)."""
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"(?s)<!--.*\Z", " ", s)
    s = re.sub(r"(?s)<!\[CDATA\[(.*?)\]\]>", r" \1 ", s)
    for tag in X.HTML_CONTAINER_TAGS:
        s = re.sub(rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " ", s)
        s = re.sub(rf"(?is)<{tag}\b[^>]*>.*\Z", " ", s)
    s = re.sub(rf"(?is)</?(?:{X.HTML_BLOCK_TAGS})\b[^>]*>", "\n", s)
    s = re.sub(r"(?s)<[a-zA-Z/!?][^>]*>", " ", s)
    s = re.sub(r"(?s)<[a-zA-Z/!?][^>]*\Z", " ", s)
    if entities == "core":
        for src, dst in X.HTML_CORE_ENTITIES:
            s = s.replace(src, dst)
    elif entities == "full":
        import html

        s = html.unescape(s)
    s = re.sub(r"\s*\n\s*", "\n", s)
    s = re.sub(r"[^\S\n]+", " ", s)
    s = re.sub(r"^\s+|\s+$", "", s)
    return s


HAND_CASES = [
    (
        '<html><!-- c --><head><title>T</title><script>if(a<b){x=1}'
        "</script><style>p{}</style></head><body><h1>Title &amp; Stats"
        '</h1><p>hello world</p><div class="f">Copyright &copy; 2024 '
        "&lt;Corp&gt;</div>5 &lt; 6<br/>end</body></html>",
        "Title & Stats\nhello world\nCopyright © 2024 <Corp>"
        "\n5 < 6\nend",
    ),
    ("<script>never closed...", ""),
    ("<p>unclosed para <b>bold", "unclosed para bold"),
    ("no html at all", "no html at all"),
    ("<!-- unterminated", ""),
    ("<p>A&amp;lt;B</p>", "A&lt;B"),  # one-pass unescape semantics
    ("<![CDATA[keep me]]>", "keep me"),
    ("", ""),
    ("<p>5 &lt; 6 and x > y</p>", "5 < 6 and x > y"),
    ("<SCRIPT SRC='x'>UPPER case</ScRiPt>after", "after"),
    ("<p>a</p><p></p><p>b</p>", "a\nb"),  # empty blocks collapse
    ("<td>cell1</td><td>cell2</td>", "cell1\ncell2"),
    ("&#x2603; stays in core", "&#x2603; stays in core"),
]


def _extract_all(spark, cases, entities="core"):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], ["i", "html"]
    )
    rows = X.html_extract(df, "html", "t", entities=entities).collect()
    return {r["i"]: r["t"] for r in rows}


def test_hand_cases(spark):
    got = _extract_all(spark, [c for c, _ in HAND_CASES])
    for i, (case, want) in enumerate(HAND_CASES):
        assert got[i] == want, (case, got[i], want)


def test_full_entities_numeric(spark):
    got = _extract_all(
        spark, ["<p>&#x2603;&#65; &amp; &unknown;</p>"], entities="full"
    )
    assert got[0] == "☃A & &unknown;"


_FUZZ_VOCAB = [
    "<", ">", "</", "<p", "<p>", "</p>", "<div class='", "'>",
    "<script>", "</script>", "<script", "<style>", "</style>",
    "<!--", "-->", "<![CDATA[", "]]>", "&amp;", "&lt;", "&gt;", "&",
    ";", "&#65;", "&#x41;", "word", "two words", " ", "\n", "\t",
    '"', "'", "=", "<br/>", "<hr>", "<b>", "</b>", "<h1>", "</h1>",
    "<a href='x'>", "</a>", "<iframe>", "</iframe>", "<head>",
    "</head>", "<table><tr><td>", "é中文", "<!DOCTYPE html>",
    "<?xml?>", "a<b", "x>y",
]


def test_fuzz_matches_python_reference(spark):
    """300 random concatenations of HTML fragments (many malformed):
    the Spark chain must equal the pure-Python re implementation and
    never crash. Seeded, so failures reproduce."""
    rng = random.Random(20260815)
    cases = [
        "".join(rng.choices(_FUZZ_VOCAB, k=rng.randint(1, 40)))
        for _ in range(300)
    ]
    got = _extract_all(spark, cases)
    for i, c in enumerate(cases):
        want = _py_extract(c)
        assert got[i] == want, (repr(c), repr(got[i]), repr(want))


def test_fuzz_full_entities(spark):
    rng = random.Random(42)
    cases = [
        "".join(rng.choices(_FUZZ_VOCAB, k=rng.randint(1, 30)))
        for _ in range(100)
    ]
    got = _extract_all(spark, cases, entities="full")
    for i, c in enumerate(cases):
        assert got[i] == _py_extract(c, entities="full"), repr(c)


def test_no_container_content_leaks(spark):
    """Whatever the surrounding malformation, script/style content must
    never appear in extracted text."""
    rng = random.Random(7)
    cases = []
    for _ in range(80):
        pre = "".join(rng.choices(_FUZZ_VOCAB, k=rng.randint(0, 10)))
        post = "".join(rng.choices(_FUZZ_VOCAB, k=rng.randint(0, 10)))
        closed = rng.random() < 0.5
        body = "SECRETJS var x = 1;"
        cases.append(
            pre + "<script>" + body + ("</script>" if closed else "") + post
        )
    got = _extract_all(spark, cases)
    for i in range(len(cases)):
        assert "SECRETJS" not in got[i], repr(cases[i])


def test_invalid_entities_mode():
    import pandas as pd  # noqa: F401

    with pytest.raises(ValueError, match="entities"):
        X.html_extract(None, "x", entities="bogus")


class TestC4LineFilter:
    def test_basic_rules(self, spark):
        text = (
            "this is a good long line\nok bye\njavascript needed\n"
            "buy { now }\nfive words in this line"
        )
        df = spark.createDataFrame([(0, text)], ["i", "t"])
        r = X.c4_line_filter(df, "t").collect()[0]
        assert r["text_clean"] == (
            "this is a good long line\nfive words in this line"
        )
        assert r["n_kept_lines"] == 2

    def test_terminal_punctuation(self, spark):
        df = spark.createDataFrame(
            [(0, "a proper sentence here.\nno terminal punctuation here")],
            ["i", "t"],
        )
        r = X.c4_line_filter(df, "t", require_terminal=True).collect()[0]
        assert r["text_clean"] == "a proper sentence here."

    def test_min_kept_lines_drops_page(self, spark):
        df = spark.createDataFrame(
            [(0, "only one good line here"), (1, "good one\ngood two here")],
            ["i", "t"],
        )
        out = X.c4_line_filter(df, "t", min_words=2, min_kept_lines=2)
        assert [r["i"] for r in out.collect()] == [1]

    def test_empty_text(self, spark):
        df = spark.createDataFrame([(0, "")], ["i", "t"])
        r = X.c4_line_filter(df, "t").collect()[0]
        assert r["text_clean"] == "" and r["n_kept_lines"] == 0


class TestSplitSentences:
    def test_boundaries_and_edges(self, spark):
        cases = [
            (0, "First sentence. Second one! Third? tail without terminal"),
            (1, "no punctuation here at all"),
            (2, ""),
            (3, "  Multiple   spaces.   After.  "),
            (4, "Dotted.End"),  # no whitespace after '.' -> one sentence
        ]
        out = {
            r["i"]: (r["sentences"], r["n_sentences"])
            for r in X.split_sentences(
                spark.createDataFrame(cases, ["i", "t"]), "t"
            ).collect()
        }
        assert out[0] == (
            ["First sentence.", "Second one!", "Third?",
             "tail without terminal"],
            4,
        )
        assert out[1] == (["no punctuation here at all"], 1)
        assert out[2] == ([], 0)
        assert out[3] == (["Multiple   spaces.", "After."], 2)
        assert out[4] == (["Dotted.End"], 1)

    def test_inband_sentinel_stripped(self, spark):
        # U+001E in the INPUT must not act as a boundary: it is the
        # operator's internal record separator and gets stripped first.
        df = spark.createDataFrame(
            [(0, "alpha\x1ebeta gamma. next one")], ["i", "t"]
        )
        row = X.split_sentences(df, "t").collect()[0]
        assert row["n_sentences"] == 2
        assert row["sentences"] == ["alphabeta gamma.", "next one"]

    def test_pure_catalyst(self, spark):
        df = spark.createDataFrame([(0, "a. b")], ["i", "t"])
        plan = (
            X.split_sentences(df, "t")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan and "Exchange" not in plan


class TestHtmlMetadata:
    def test_fields(self, spark):
        cases = [
            (0, '<html lang="en-US"><head><title> Hello &amp; World '
                '</title><link rel="canonical" href="https://ex.com/a"/>'
                '<meta name="robots" content="noindex,nofollow"></head>'
                "<body>x</body></html>"),
            (1, '<html><head><link href="https://ex.com/b" rel=canonical>'
                '<META NAME=robots CONTENT="index,follow"></head>'),
            (2, "no html"),
            (3, "<html lang='fr'><title>Deux\n  lignes</title>"),
        ]
        out = {
            r["i"]: r
            for r in X.html_metadata(
                spark.createDataFrame(cases, ["i", "h"]), "h"
            ).collect()
        }
        assert out[0]["html_title"] == "Hello & World"
        assert out[0]["html_lang"] == "en-US"
        assert out[0]["html_canonical"] == "https://ex.com/a"
        assert out[0]["html_noindex"] is True
        # href-before-rel attribute order; robots without noindex
        assert out[1]["html_canonical"] == "https://ex.com/b"
        assert out[1]["html_noindex"] is False
        assert out[1]["html_title"] is None and out[1]["html_lang"] is None
        assert out[2]["html_title"] is None and out[2]["html_canonical"] is None
        assert out[3]["html_title"] == "Deux lignes"
        assert out[3]["html_lang"] == "fr"

    def test_pure_catalyst(self, spark):
        df = spark.createDataFrame([(0, "<title>t</title>")], ["i", "h"])
        plan = (
            X.html_metadata(df, "h")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan and "Exchange" not in plan


class TestScriptProfile:
    def test_counts_and_main(self, spark):
        cases = [
            (0, "hello world 123!"),
            (1, "Привет мир"),
            (2, "你好世界 hello"),
            (3, ""),
            (4, "!!! ,,, ..."),
            (5, "مرحبا"),
        ]
        out = {
            r["i"]: r
            for r in X.script_profile(
                spark.createDataFrame(cases, ["i", "t"]), "t"
            ).collect()
        }
        assert (out[0]["script_latin"], out[0]["script_digit"],
                out[0]["script_other"], out[0]["script_main"]) == (
            10, 3, 1, "latin")
        assert (out[1]["script_cyrillic"], out[1]["script_main"]) == (
            9, "cyrillic")
        # latin ties with... no: 5 latin vs 4 cjk -> latin wins
        assert (out[2]["script_cjk"], out[2]["script_main"]) == (4, "latin")
        assert out[3]["script_main"] == "none"
        assert (out[4]["script_other"], out[4]["script_main"]) == (9, "none")
        assert (out[5]["script_arabic"], out[5]["script_main"]) == (
            5, "arabic")

    def test_pure_catalyst(self, spark):
        df = spark.createDataFrame([(0, "abc")], ["i", "t"])
        plan = (
            X.script_profile(df, "t")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan and "Exchange" not in plan


class TestBm25:
    def test_matches_hand_math(self, spark):
        import math

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),
                (2, "the lazy dog sleeps"),
                (3, "quick quick quick fox"),
                (4, "unrelated words entirely here"),
            ],
            ["doc_id", "text"],
        )
        out = X.bm25_topk(
            docs, "text", "doc_id",
            [("q1", "quick fox"), ("q2", "lazy dog")], k=3,
        ).orderBy("query_id", "rank").collect()
        N, avgdl = 4, (5 + 4 + 4 + 4) / 4

        def s(tf, dl, dfq, k1=1.2, b=0.75):
            idf = math.log(1 + (N - dfq + 0.5) / (dfq + 0.5))
            return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))

        got = [(r["query_id"], r["doc_id"], r["score"], r["rank"])
               for r in out]
        assert got == [
            ("q1", 3, round(s(3, 4, 2) + s(1, 4, 2), 6), 1),
            ("q1", 1, round(s(1, 5, 2) + s(1, 5, 2), 6), 2),
            ("q2", 2, round(s(1, 4, 1) + s(1, 4, 1), 6), 1),
        ]

    def test_empty_queries_rejected(self, spark):
        docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="queries"):
            X.bm25_topk(docs, "text", "doc_id", [])

    def test_empty_corpus_rejected(self, spark):
        # All-blank text -> zero scoreable docs -> explicit ValueError,
        # not a float(None) TypeError from the null avgdl.
        docs = spark.createDataFrame(
            [(1, "   "), (2, "")], ["doc_id", "text"]
        )
        with pytest.raises(ValueError, match="no documents"):
            X.bm25_topk(docs, "text", "doc_id", [("q", "x")])

    def test_no_global_sort(self, spark):
        docs = spark.createDataFrame(
            [(i, f"word{i} shared") for i in range(20)],
            ["doc_id", "text"],
        )
        plan = (
            X.bm25_topk(docs, "text", "doc_id", [("q", "shared")], k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # ranking is per-query (hash-partitioned window), never a
        # global range-partitioned sort of the corpus
        assert "rangepartitioning" not in plan.lower()
