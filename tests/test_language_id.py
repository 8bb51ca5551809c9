"""Trained language identification: feature hashing, GD training,
serving, and the heuristic-vs-trained separation story."""

import pytest
from pyspark.sql import functions as F

from tumult_analytics_spark.operators import text as X

MARK = {
    "de": "auch nach werden über einer wenn schon beim jahr mehr",
    "en": "about which their people would there been time more other",
    "es": "pero sobre entre hacer tiempo años donde mismo según cosa",
    "fr": "être cette aussi comme faire chose temps leur bien sans",
}
CLASSES = ["de", "en", "es", "fr"]


@pytest.fixture()
def corpus(spark):
    # Balanced, marker-injected, Latin-script-confusable: the shared
    # filler contains the english stopwords "the"/"a", so the stopword
    # heuristic votes 'en' for EVERY doc.
    rows = []
    for i in range(200):
        lang = CLASSES[i % 4]
        rows.append(
            (i, lang, (MARK[lang] + " ") * 3
             + f"the batch a window value spark data number {i}")
        )
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


class TestHashedCharNgrams:
    def test_matches_hand_hash(self, spark):
        import hashlib

        df = spark.createDataFrame([(0, "abcd"), (1, "ab"), (2, None)],
                                   ["i", "t"])
        out = {r["i"]: r["char_vec"]
               for r in X.hashed_char_ngrams(df, "t", dim=4).collect()}
        import numpy as np

        want = np.zeros(4, dtype=int)
        for g in ["abc", "bcd"]:
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            want[h % 4] += 1 - 2 * ((h // 4) % 2)
        assert list(out[0]) == list(want)
        assert list(out[1]) == [0, 0, 0, 0]  # shorter than n
        assert out[2] is None

    def test_invalid_args(self, spark):
        df = spark.createDataFrame([(0, "x")], ["i", "t"])
        with pytest.raises(ValueError, match="dim"):
            X.hashed_char_ngrams(df, "t", dim=0)
        with pytest.raises(ValueError, match="n must"):
            X.hashed_char_ngrams(df, "t", n=0)

    def test_gram_cache_bounded(self, monkeypatch):
        # r10 verdict #4: the per-worker gram cache must not grow without
        # bound over diverse text — past the cap it is cleared and the
        # kernel stays correct (md5 recompute, same values).
        import random

        import pandas as pd

        monkeypatch.setattr(X, "_GRAM_CACHE_MAX", 50)
        fn = X._char_ngram_kernel(8, 3, True)
        rng = random.Random(7)
        ref = None
        probe = pd.Series(["probe document text"])
        for _ in range(4):
            docs = pd.Series(
                ["".join(chr(0x4E00 + rng.randrange(4000))
                         for _ in range(120)) for _ in range(10)]
            )
            fn(docs)
            # cache never exceeds cap + one batch's unique grams
            assert len(fn._gram_cache) <= 50 + 120 * 10
            got = list(fn(probe)[0])
            if ref is None:
                ref = got
            assert got == ref  # correct across clears

    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_vectorized_kernel_matches_reference_loop(self, spark, n):
        # r10: the kernel packs codepoints into rolling int64 keys and
        # bincounts per doc — must stay bit-identical to the per-char
        # md5 loop across doc boundaries, nulls, sub-n docs and
        # non-BMP codepoints (4-byte UTF-8 grams).
        import hashlib

        import numpy as np

        texts = [None, "", "a", "ab", "abc", "hello hello world",
                 "хорошо привет", "你好世界" * 9, "😀😃😄 emoji 😀😃",
                 "aaa" * 50, " \t\n mixed WS "]
        dim = 16
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, t string"
        )
        got = {r["i"]: r["char_vec"]
               for r in X.hashed_char_ngrams(df, "t", dim=dim, n=n)
               .collect()}
        for i, t in enumerate(texts):
            if t is None:
                assert got[i] is None
                continue
            want = np.zeros(dim, dtype=np.int64)
            for j in range(len(t) - n + 1):
                h = int(hashlib.md5(t[j:j + n].encode()).hexdigest()[:15],
                        16)
                want[h % dim] += 1 - 2 * ((h // dim) % 2)
            assert list(got[i]) == list(want), (n, i, t)


class TestLanguageTrain:
    def test_trajectory_shape_and_learning(self, spark, corpus):
        hist = X.language_train_logreg(
            corpus, "text", "lang", CLASSES, dim=16, steps=3
        )
        rows = hist.collect()
        assert len(rows) == 3 * 4
        # mse (measured pre-update) must decrease per class over steps
        by_class = {}
        for r in sorted(rows, key=lambda r: (r["class"], r["step"])):
            by_class.setdefault(r["class"], []).append(r["mse"])
        for c, mses in by_class.items():
            assert mses[0] > mses[-1], c

    def test_guards(self, spark, corpus):
        with pytest.raises(ValueError, match="steps"):
            X.language_train_logreg(corpus, "text", "lang", CLASSES, steps=0)
        with pytest.raises(ValueError, match="classes"):
            X.language_train_logreg(corpus, "text", "lang", [], steps=1)
        with pytest.raises(ValueError, match="empty training"):
            X.language_train_logreg(
                corpus.filter("1=0"), "text", "lang", CLASSES, steps=1
            )


class TestServing:
    def _train(self, corpus, dim=16, steps=3):
        hist = X.language_train_logreg(
            corpus, "text", "lang", CLASSES, dim=dim, steps=steps
        )
        return {
            r["class"]: (round(r["bias"], 6),
                         [round(r[f"w{j}"], 6) for j in range(dim)])
            for r in hist.filter(F.col("step") == steps).collect()
        }

    def test_trained_separates_heuristic_cannot(self, spark, corpus):
        n = corpus.count()
        heur = X.language_id(corpus, "text")
        heur_acc = heur.filter("lang = lang_pred").count() / n
        # every doc contains 'the'/'a' filler and no other stopwords:
        # the heuristic is pinned to 'en'
        assert heur.filter("lang_pred = 'en'").count() == n
        assert heur_acc == pytest.approx(0.25, abs=0.01)
        model = self._train(corpus)
        trained = X.language_id(corpus, "text", model=model)
        trained_acc = trained.filter("lang = lang_pred").count() / n
        assert trained_acc >= 0.95

    def test_model_ngram_size_plumbed(self, spark, corpus):
        # A model trained at n=2 must serve on n=2 features through
        # the language_id(model=..., n=...) dispatch — the default
        # n=3 would score mismatched features and tank accuracy.
        n_docs = corpus.count()
        hist = X.language_train_logreg(
            corpus, "text", "lang", CLASSES, dim=16, steps=3, n=2
        )
        model = {
            r["class"]: (round(r["bias"], 6),
                         [round(r[f"w{j}"], 6) for j in range(16)])
            for r in hist.filter(F.col("step") == 3).collect()
        }
        served = X.language_id(corpus, "text", model=model, n=2)
        acc = served.filter("lang = lang_pred").count() / n_docs
        assert acc >= 0.95
        # and the two serving paths agree exactly
        direct = X.language_id_trained(corpus, "text", model, dim=16, n=2)
        assert (
            served.select("doc_id", "lang_pred").collect()
            == direct.select("doc_id", "lang_pred").collect()
        )

    def test_und_margin(self, spark, corpus):
        # With a huge margin everything is 'und'; with margin 0 the
        # strictly-greater argmax is unchanged; a zero-signal doc (tie
        # on every score) is 'und' under any positive margin.
        model = self._train(corpus)
        allund = X.language_id_trained(
            corpus, "text", model, dim=16, und_margin=1e9
        )
        assert allund.filter("lang_pred <> 'und'").count() == 0
        same = X.language_id_trained(
            corpus, "text", model, dim=16, und_margin=0.0
        )
        base = X.language_id_trained(corpus, "text", model, dim=16)
        assert (
            same.filter("lang_pred = 'und'").count() == 0
            and same.select("doc_id", "lang_pred").collect()
            == base.select("doc_id", "lang_pred").collect()
        )
        blank = spark.createDataFrame([(0, "xy")], ["i", "t"])  # zero vec
        tied = {c: (0.0, [0.0] * 4) for c in CLASSES}
        out = X.language_id_trained(
            blank, "t", tied, dim=4, und_margin=1e-9
        ).collect()[0]
        assert out["lang_pred"] == "und"

    def test_tie_break_first_class_wins(self, spark):
        df = spark.createDataFrame([(0, "xy")], ["i", "t"])  # zero vec
        model = {c: (0.0, [0.0] * 4) for c in CLASSES}  # all scores equal
        out = X.language_id_trained(df, "t", model, dim=4).collect()[0]
        assert out["lang_pred"] == CLASSES[0]

    def test_guards(self, spark, corpus):
        with pytest.raises(ValueError, match="weights"):
            X.language_id_trained(corpus, "text", {})
        with pytest.raises(ValueError, match="entries"):
            X.language_id_trained(corpus, "text", {"en": (0.0, [0.0])},
                                  dim=4)


class TestVectorizedTrainer:
    """language_train_logreg_vec / language_id_trained_vec: the
    production-dim kernels must compute the SAME math as the
    oracle-graded Catalyst twins."""

    def test_weight_parity_with_catalyst_trainer(self, spark, corpus):
        dim, steps = 16, 3
        cat = X.language_train_logreg(
            corpus, "text", "lang", CLASSES, dim=dim, steps=steps
        ).collect()
        vec = X.language_train_logreg_vec(
            corpus, "text", "lang", CLASSES, dim=dim, steps=steps
        ).collect()
        cat_by = {(r["step"], r["class"]): r for r in cat}
        for r in vec:
            c = cat_by[(r["step"], r["class"])]
            assert abs(r["bias"] - c["bias"]) < 1e-9
            assert abs(r["mse"] - c["mse"]) < 1e-9
            for j in range(dim):
                assert abs(r["w"][j] - c[f"w{j}"]) < 1e-9

    def test_serving_parity_with_catalyst_server(self, spark, corpus):
        dim, steps = 16, 2
        hist = X.language_train_logreg_vec(
            corpus, "text", "lang", CLASSES, dim=dim, steps=steps
        )
        model = {
            r["class"]: (r["bias"], r["w"])
            for r in hist.filter(F.col("step") == steps).collect()
        }
        a = X.language_id_trained(
            corpus, "text", {c: model[c] for c in CLASSES}, dim=dim
        ).select("doc_id", "lang_pred").collect()
        b = X.language_id_trained_vec(
            corpus, "text", {c: model[c] for c in CLASSES}, dim=dim
        ).select("doc_id", "lang_pred").collect()
        assert {r["doc_id"]: r["lang_pred"] for r in a} == {
            r["doc_id"]: r["lang_pred"] for r in b
        }

    def test_vec_margin_and_ties(self, spark):
        blank = spark.createDataFrame([(0, "xy")], ["i", "t"])
        tied = {c: (0.0, [0.0] * 4) for c in CLASSES}
        out = X.language_id_trained_vec(
            blank, "t", tied, dim=4, und_margin=1e-9
        ).collect()[0]
        assert out["lang_pred"] == "und"
        # argmax takes the FIRST max: tie-break parity with the fold
        out2 = X.language_id_trained_vec(
            blank, "t", tied, dim=4
        ).collect()[0]
        assert out2["lang_pred"] == CLASSES[0]

    def test_vec_null_text_stays_null(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, "the data value")], "i long, t string"
        )
        model = {c: (0.1, [0.01] * 8) for c in CLASSES}
        rows = {
            r["i"]: r["lang_pred"]
            for r in X.language_id_trained_vec(
                df, "t", model, dim=8
            ).collect()
        }
        assert rows[0] is None and rows[1] is not None

    def test_vec_guards(self, spark, corpus):
        with pytest.raises(ValueError, match="steps"):
            X.language_train_logreg_vec(
                corpus, "text", "lang", CLASSES, dim=8, steps=0
            )
        with pytest.raises(ValueError, match="empty"):
            X.language_train_logreg_vec(
                corpus.filter("1=0"), "text", "lang", CLASSES, dim=8
            )
        with pytest.raises(ValueError, match="4 x 8"):
            X.language_id_trained_vec(
                corpus, "text", {c: (0.0, [0.0] * 3) for c in CLASSES},
                dim=8,
            )

    def test_nt_column_and_persist_false_match_defaults(self, spark, corpus):
        dim, steps = 8, 2
        with_vec = X.hashed_char_ngrams(
            corpus, "text", dim=dim, output_column="cv"
        ).withColumn(
            "nt",
            F.greatest(F.length("text") - 2, F.lit(1)).cast("double"),
        )
        a = X.language_train_logreg_vec(
            with_vec, "text", "lang", CLASSES, dim=dim, steps=steps,
            vec_column="cv",
        ).collect()
        b = X.language_train_logreg_vec(
            with_vec, None, "lang", CLASSES, dim=dim, steps=steps,
            vec_column="cv", nt_column="nt", persist=False,
        ).collect()
        am = {(r["step"], r["class"]): (r["bias"], r["w"]) for r in a}
        for r in b:
            bias, w = am[(r["step"], r["class"])]
            assert abs(r["bias"] - bias) < 1e-12
            assert max(abs(x - y) for x, y in zip(r["w"], w)) < 1e-12
