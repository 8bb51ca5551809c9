"""Driver-contract queries for the pipeline operators (dedup, text,
similarity, multimodal, windowed events). Oracle SQL is provided wherever
the computation is exactly reproducible in ANSI SQL (integer arithmetic or
identical-formula double math); hash/LSH-based ops are rows-only."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D
from . import pipeline as P
from . import similarity as S
from . import text as X


#: (SparkSession id, sf_dir, table) -> DataFrame. Immutable logical plans;
#: caching skips the per-query footer-read/analysis round trip.
_READ_CACHE: dict = {}


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    df = _READ_CACHE.get(key)
    if df is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NTZ timestamps (timestamp[us] parquet) are epoch-compared
        # against DuckDB, which treats NTZ micros as raw epoch — pin UTC.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _READ_CACHE[key] = df
    return df


# --- dedup -----------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return (
        D.dedup_exact(docs, ["text"])
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )


def q_fingerprint_dedup(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    fp = X.document_fingerprint(docs, "text")
    return fp.groupBy("source").agg(
        F.countDistinct("fingerprint").alias("n_unique")
    )


def q_minhash_dedup(spark, sf_dir):
    # Banded-LSH near-dup removal over md5-based MinHash signatures:
    # deterministic integer arithmetic, value-checked against a DuckDB
    # oracle that recomputes signatures/bands/agreement in SQL.
    docs = _read(spark, sf_dir, "documents")
    kept = D.minhash_lsh_dedup(
        docs, "text", "doc_id", num_hashes=32, bands=8,
        min_signature_similarity=0.7, signature_fn="md5",
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def q_substring_dedup_stats(spark, sf_dir):
    # Exact substring dedup (Lee et al. 2022 suffix-array family,
    # re-expressed as gram-hash joins + span-merge windows): cut every
    # cross-document repeated span >= 50 chars (keep-first), then
    # report per-lang affected-doc and char counts FROM THE CLEANED
    # TEXT — so the span finder AND the span cutter are both
    # value-checked against the oracle's span arithmetic.
    # prefilter_winnow=True: the 100 TB shape (winnowed-fingerprint
    # candidate discovery before the exact gram pass) — provably
    # identical results, so the SQL oracle also value-checks the
    # prefilter's soundness every round.
    docs = _read(spark, sf_dir, "documents")
    out = D.substring_dedup(
        docs, "text", "doc_id", min_length=50, prefilter_winnow=True
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.length("text") != F.length("text_dedup")).cast("long")
        ).alias("n_affected"),
        F.sum(F.length("text") - F.length("text_dedup")).alias(
            "chars_removed"
        ),
        F.sum(F.length("text_dedup")).alias("chars_kept"),
    )


_SUBSTRING_DEDUP_ORACLE = """
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text) - 49, 0) + 1)) AS p
      FROM documents
    ), grams AS (
      SELECT doc_id, CAST(p AS INT) AS p,
             ('0x' || substr(md5(substr(text, CAST(p AS INT), 50)),
                             1, 15))::BIGINT AS h
      FROM pos
    ), owners AS (
      SELECT h, min(doc_id) AS own FROM grams GROUP BY h
    ), matched AS (
      SELECT DISTINCT g.doc_id, g.p
      FROM grams g JOIN owners o ON g.h = o.h
      WHERE g.doc_id > o.own
    ), flagged AS (
      SELECT doc_id, p,
        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 50
             THEN 1 ELSE 0 END AS brk
      FROM matched
    ), islands AS (
      SELECT doc_id, p,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS UNBOUNDED PRECEDING) AS g
      FROM flagged
    ), spans AS (
      SELECT doc_id, g, min(p) AS s, max(p) + 49 AS e
      FROM islands GROUP BY doc_id, g
    ), removed AS (
      SELECT doc_id, sum(e - s + 1) AS cut FROM spans GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(r.doc_id) AS BIGINT) AS n_affected,
           CAST(coalesce(sum(r.cut), 0) AS BIGINT) AS chars_removed,
           CAST(sum(length(d.text) - coalesce(r.cut, 0)) AS BIGINT)
             AS chars_kept
    FROM documents d LEFT JOIN removed r ON r.doc_id = d.doc_id
    GROUP BY d.lang
"""


def q_span_decontamination_stats(spark, sf_dir):
    # SPAN-level cross-corpus decontamination (Lee et al. 2022 §6.2):
    # where crosscorpus_decontaminated drops whole near-dup docs, this
    # cuts the exact verbatim benchmark overlaps (>= 40 chars) out of
    # the surviving text. doc_id % 10 == 0 plays the held-out
    # benchmark; stats come FROM THE CLEANED TEXT so the span finder
    # AND the cutter are value-checked. prefilter_winnow=True runs the
    # 100 TB shape (only docs sharing a winnowed fingerprint with the
    # broadcast benchmark set pay the per-character gram explode) and
    # the oracle checks its soundness cross-corpus every round.
    docs = _read(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 != 0")
    benchmark = docs.filter("doc_id % 10 = 0")
    out = D.decontaminate_substrings(
        corpus, benchmark, "text", "doc_id", min_length=40,
        prefilter_winnow=True,
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.length("text") != F.length("text_decontaminated")).cast(
                "long"
            )
        ).alias("n_affected"),
        F.sum(
            F.length("text") - F.length("text_decontaminated")
        ).alias("chars_removed"),
        F.sum(F.length("text_decontaminated")).alias("chars_kept"),
    )


_SPAN_DECONTAMINATION_ORACLE = """
    WITH bench_grams AS (
      SELECT DISTINCT
             ('0x' || substr(md5(substr(text, CAST(p AS INT), 40)),
                             1, 15))::BIGINT AS h
      FROM (
        SELECT text,
               unnest(range(1, greatest(length(text) - 39, 0) + 1)) AS p
        FROM documents WHERE doc_id % 10 = 0
      )
    ), grams AS (
      SELECT doc_id, CAST(p AS INT) AS p,
             ('0x' || substr(md5(substr(text, CAST(p AS INT), 40)),
                             1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 39, 0) + 1)) AS p
        FROM documents WHERE doc_id % 10 <> 0
      )
    ), matched AS (
      SELECT DISTINCT g.doc_id, g.p
      FROM grams g JOIN bench_grams b ON g.h = b.h
    ), flagged AS (
      SELECT doc_id, p,
        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 40
             THEN 1 ELSE 0 END AS brk
      FROM matched
    ), islands AS (
      SELECT doc_id, p,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS UNBOUNDED PRECEDING) AS g
      FROM flagged
    ), spans AS (
      SELECT doc_id, g, min(p) AS s, max(p) + 39 AS e
      FROM islands GROUP BY doc_id, g
    ), removed AS (
      SELECT doc_id, sum(e - s + 1) AS cut FROM spans GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(r.doc_id) AS BIGINT) AS n_affected,
           CAST(coalesce(sum(r.cut), 0) AS BIGINT) AS chars_removed,
           CAST(sum(length(d.text) - coalesce(r.cut, 0)) AS BIGINT)
             AS chars_kept
    FROM documents d LEFT JOIN removed r ON r.doc_id = d.doc_id
    WHERE d.doc_id % 10 <> 0
    GROUP BY d.lang
"""


def q_simhash_buckets(spark, sf_dir):
    # 60-bit md5 SimHash (pure Catalyst), bucketed by top byte;
    # value-checked against the same arithmetic in SQL.
    docs = _read(spark, sf_dir, "documents")
    sh = D.simhash(docs, "text", "doc_id")
    return (
        sh.withColumn(
            "bucket", F.shiftrightunsigned("simhash", D.SIMHASH_BITS - 8)
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_ngram_jaccard(spark, sf_dir):
    # Exact 3-gram Jaccard pairs at >=0.35 among first 200 docs. Gram
    # sets are identical to SQL's string n-grams (FNV hashing only
    # renames them); the threshold compare uses the same double division
    # in both engines.
    docs = _read(spark, sf_dir, "documents").filter("doc_id < 200")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.35)
    return pairs.groupBy().agg(F.count(F.lit(1)).alias("n_pairs"))


# --- text ------------------------------------------------------------------


def q_token_stats(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    tc = X.token_count(docs, "text")
    return tc.groupBy("lang").agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_quality_stats(spark, sf_dir):
    from ..utils import spread_rows  # heavy Catalyst chain: SCALE.md hazard 1
    docs = spread_rows(_read(spark, sf_dir, "documents"))
    q = X.quality_score(docs, "text")
    return q.groupBy("lang").agg(
        F.sum((F.col("quality") >= 0.99).cast("long")).alias("n_good"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_language_id(spark, sf_dir):
    # Stopword-vote language ID vs labeled lang; deterministic, with the
    # vote/tie-break logic reproduced exactly in SQL.
    docs = _read(spark, sf_dir, "documents")
    pred = X.language_id(docs, "text")
    return pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )


# --- similarity ------------------------------------------------------------


def q_ann_brute_topk(spark, sf_dir):
    # Exact cosine top-3 for 50 query vectors. Ranking is done on
    # round(cosine, 6) with a neighbor_id tie-break so the ordering is
    # insensitive to FP summation order and reproducible in SQL: a flip
    # would need the true cosine within ~1e-14 of a 5e-7 rounding
    # boundary (the engines agree to ~64 ulps on a 64-dim dot product).
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 50")
    allk = S.brute_force_cosine_topk(
        emb, "embedding", "vec_id", k=3, queries=queries,
        # deterministic=True: the kernel itself selects the top-3 by
        # (round(cosine, 6) desc, id asc) — the exact ordering of the
        # re-rank window below, over the full broadcast corpus — so it
        # emits 3 rows per query instead of the whole pair set, and
        # the window ranks 150 rows instead of |Q| x |corpus|.
        include_rank=False, deterministic=True,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


ANN_IVF_NLIST = 16
ANN_IVF_NPROBE = 4
CHUNK_IVF_NPROBE = 4
ANN_LSH_BITS = 8
ANN_LSH_TABLES = 2


def q_ann_ivf_topk(spark, sf_dir):
    # IVF coarse-quantizer ANN with deterministic centroids (the
    # embeddings of vec_id < nlist): the full cell assignment, probe
    # order, candidate set and ranking are replayed exactly in SQL.
    # Candidate scoring/rank uses round(cosine, 6) + id tie-break (the
    # FP-robust trick proven on ann_brute_topk). The sampled-k-means
    # quantizer remains the production default (recall-tested in
    # tests/test_session_features.py).
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    cents = [
        r["embedding"]
        for r in emb.filter(f"vec_id < {ANN_IVF_NLIST}").orderBy("vec_id").collect()
    ]
    allk = S.ivf_cosine_topk(
        emb, "embedding", "vec_id", k=3,
        nlist=ANN_IVF_NLIST, nprobe=ANN_IVF_NPROBE, centroids=cents,
        deterministic=True, include_rank=False,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


def q_ann_lsh_topk(spark, sf_dir):
    # Sign-LSH approximate top-3 with deterministic Rademacher planes:
    # bucket bits, candidate pairs and ranking all integer/rounded
    # arithmetic, replayed exactly in SQL.
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings").filter("vec_id < 2000")
    allk = S.lsh_cosine_topk(
        emb, "embedding", "vec_id", k=3,
        bits=ANN_LSH_BITS, tables=ANN_LSH_TABLES, plane_kind="rademacher",
        deterministic=True, include_rank=False,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


def q_ann_lsh_index_topk(spark, sf_dir):
    # Same search as ann_lsh_topk but through the persisted-index API:
    # build_lsh_index materializes the bucketed signatures once, then
    # query_lsh_index buckets only the query side and cogroups against
    # the stored signatures. Must produce bit-identical results to the
    # one-shot path, so it shares its SQL oracle.
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings").filter("vec_id < 2000")
    idx = S.build_lsh_index(
        emb, "embedding", "vec_id",
        bits=ANN_LSH_BITS, tables=ANN_LSH_TABLES, plane_kind="rademacher",
    )
    allk = S.query_lsh_index(idx, emb, k=3, deterministic=True,
                             include_rank=False)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


ANN_INDEX_QUERY_CAP = 2000  # fixed query batch for the index queries


def _auto_oracle_nlist(n: int) -> int:
    """~sqrt(n) coarse cells, floored at ANN_IVF_NLIST — the production
    `_auto_nlist` scaling made SQL-replayable (the oracle recomputes it
    as greatest(16, ceil(sqrt(count(*))))), so cell sizes stay ~sqrt(n)
    at every sf instead of n/16."""
    import math

    return max(ANN_IVF_NLIST, math.ceil(math.sqrt(n)))


def q_ann_ivf_index_topk(spark, sf_dir):
    # IVF through the persisted-index API with deterministic centroids
    # (the embeddings of vec_id < nlist, nlist = max(16, ceil(sqrt(n)))
    # recomputed identically by the SQL oracle): build once (cells
    # materialized), then query a FIXED batch of 2000 queries — the
    # build-once/query-many contract where per-query cost is
    # nprobe * |corpus|/nlist ~ sqrt(n), sublinear per decade.
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    nlist = _auto_oracle_nlist(emb.count())
    cents = [
        r["embedding"]
        for r in emb.filter(f"vec_id < {nlist}").orderBy("vec_id").collect()
    ]
    idx = S.build_ivf_index(
        emb, "embedding", "vec_id", nlist=nlist, centroids=cents
    )
    queries = emb.filter(f"vec_id < {ANN_INDEX_QUERY_CAP}")
    allk = S.query_ivf_index(
        idx, queries, k=3, nprobe=ANN_IVF_NPROBE, deterministic=True,
        include_rank=False,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


ANN_PQ_M = 4
ANN_PQ_KSZ = 4  # 2^nbits codebook entries per subspace

#: Production-shaped IVF-PQ operating point (graded in
#: ann_recall_stats as 'ivfpq_rerank'): 8 subspaces x 64-entry
#: codebooks, wider probe, ADC shortlist of 50 re-ranked EXACTLY
#: against the raw embeddings (FAISS IndexRefine shape). The m=4/ksz=4
#: row stays as the plumbing-grade config; this row demonstrates the
#: component at knobs a production pipeline would run (measured
#: recall@3 = 0.735 at sf0.01 vs 0.05 for the bare m=4/ksz=4 ADC).
ANN_PQ2_M = 8
ANN_PQ2_KSZ = 64
ANN_PQ2_NPROBE = 12
ANN_PQ2_RERANK = 50


def q_ann_ivfpq_index_topk(spark, sf_dir):
    # IVF-PQ (Jegou et al. 2011) through the persisted-index API with
    # the same deterministic coarse centroids as ann_ivf_topk and fixed
    # codebooks derived from the first ANN_PQ_KSZ normalized embeddings
    # (subspace j's entry c = slice j of normalized vec_id=c) — so the
    # entire encode (argmin-L2 sub-codes) and ADC scoring (per-query
    # lookup-table sums) replays exactly in SQL. The index stores only
    # (id, cell, 4 int codes): no corpus floats survive into the query.
    import numpy as np
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    nlist = _auto_oracle_nlist(emb.count())
    first = emb.filter(f"vec_id < {nlist}").orderBy("vec_id").collect()
    cents = [r["embedding"] for r in first]
    dim = len(cents[0])
    sub = dim // ANN_PQ_M
    V = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in first[:ANN_PQ_KSZ]]
    )
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    cbs = np.stack(
        [V[:, j * sub : (j + 1) * sub] for j in range(ANN_PQ_M)]
    )  # (m, ksz, sub)
    idx = S.build_ivfpq_index(
        emb, "embedding", "vec_id",
        nlist=nlist, m=ANN_PQ_M, centroids=cents, codebooks=cbs,
    )
    queries = emb.filter(f"vec_id < {ANN_INDEX_QUERY_CAP}")
    allk = S.query_ivfpq_index(
        idx, queries, k=3, nprobe=ANN_IVF_NPROBE, deterministic=True,
        include_rank=False,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


RECALL_QUERY_CAP = 200


def q_ann_recall_stats(spark, sf_dir):
    # ANN QUALITY grading (not just determinism): recall@3 of each
    # approximate index — LSH, IVF, IVF-PQ, all with the same pinned
    # deterministic parameters as their ann_*_topk keys — against the
    # guarded brute-force exact top-3 for a fixed 200-query batch. The
    # recall computation is a left join truth->approx plus one
    # aggregate, so the oracle replays every path AND the comparison;
    # the VALUE of this key is the recall matrix itself. Trade-off
    # curves (recall vs nprobe/bits) are documented in SF1.md.
    import numpy as np
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(f"vec_id < {RECALL_QUERY_CAP}")

    def top3(allk):
        w = Window.partitionBy("query_id").orderBy(
            F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
        )
        return (
            allk.withColumn("rnk", F.row_number().over(w))
            .filter("rnk <= 3")
            .select("query_id", "neighbor_id")
        )

    # The truth top-3 is joined by THREE of the four union branches
    # below; without the checkpoint each branch re-runs the full
    # brute-force matmul kernel. 200 queries x 3 rows, so the
    # checkpoint is trivially small. include_rank=False also drops the
    # library's internal rank window — a full sort of the entire
    # (query x corpus) pair set whose output column top3 ignores.
    truth = top3(
        # deterministic=True: rounded-key top-3 selected inside the
        # kernel (it scores each query against the WHOLE corpus), so
        # only 3 rows per query cross the Arrow boundary — identical
        # rows to ranking the full pair set (see ann_brute_topk).
        S.brute_force_cosine_topk(emb, "embedding", "vec_id", k=3,
                                  queries=q, include_rank=False,
                                  deterministic=True)
    ).localCheckpoint(eager=True)
    nlist = _auto_oracle_nlist(emb.count())
    # One driver collect serves both centroid sets: the nlist prefix
    # IS the first slice of the (vec_id < max(nlist, ANN_PQ2_KSZ))
    # ordered collect, row for row.
    first2 = emb.filter(f"vec_id < {max(nlist, ANN_PQ2_KSZ)}").orderBy(
        "vec_id"
    ).collect()
    first = [r for r in first2 if r["vec_id"] < nlist]
    cents = [r["embedding"] for r in first]
    dim = len(cents[0])
    sub = dim // ANN_PQ_M
    V = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in first[:ANN_PQ_KSZ]]
    )
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    cbs = np.stack([V[:, j * sub : (j + 1) * sub] for j in range(ANN_PQ_M)])
    # production-shaped PQ: wider codebooks + exact refinement
    sub2 = dim // ANN_PQ2_M
    V2 = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in first2[:ANN_PQ2_KSZ]]
    )
    V2 = V2 / np.maximum(np.linalg.norm(V2, axis=1, keepdims=True), 1e-12)
    cbs2 = np.stack(
        [V2[:, j * sub2 : (j + 1) * sub2] for j in range(ANN_PQ2_M)]
    )
    # One corpus pass for all three coarse-quantizer indexes (identical
    # frames to the three separate builders — see build_ivf_family).
    ivf_idx, (pq_idx, pq2_idx) = S.build_ivf_family(
        emb, "embedding", "vec_id",
        nlist=nlist, centroids=cents, codebooks_list=(cbs, cbs2),
    )
    ivf = top3(
        S.query_ivf_index(ivf_idx, q, k=3, nprobe=ANN_IVF_NPROBE,
                          deterministic=True, include_rank=False)
    )
    pq = top3(
        S.query_ivfpq_index(pq_idx, q, k=3, nprobe=ANN_IVF_NPROBE,
                            deterministic=True, include_rank=False)
    )
    pq2 = top3(
        S.query_ivfpq_index(
            pq2_idx, q, k=3, nprobe=ANN_PQ2_NPROBE, deterministic=True,
            include_rank=False, rerank=ANN_PQ2_RERANK, corpus=emb,
        )
    )
    emb2k = emb.filter("vec_id < 2000")
    truth_sub = top3(
        S.brute_force_cosine_topk(emb2k, "embedding", "vec_id", k=3,
                                  queries=q, include_rank=False,
                                  deterministic=True)
    )
    lsh_idx = S.build_lsh_index(
        emb2k, "embedding", "vec_id",
        bits=ANN_LSH_BITS, tables=ANN_LSH_TABLES, plane_kind="rademacher",
    )
    lsh = top3(
        S.query_lsh_index(lsh_idx, q, k=3, deterministic=True,
                          include_rank=False)
    )

    def stats(method, approx, t):
        j = t.join(
            approx.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        return j.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("hits"),
        ).select(
            F.lit(method).alias("method"),
            F.col("hits").cast("long").alias("hits"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("hits") / F.col("n_pairs"), 4).alias("recall"),
        )

    return (
        stats("ivf", ivf, truth)
        .unionAll(stats("ivfpq", pq, truth))
        .unionAll(stats("ivfpq_rerank", pq2, truth))
        .unionAll(stats("lsh", lsh, truth_sub))
    )


def _ann_recall_oracle_sql() -> str:
    cap = RECALL_QUERY_CAP

    def truth_cte(corpus_pred: str) -> str:
        return f"""(
      WITH sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])), 6) AS cs
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {cap}{corpus_pred}
      )
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, neighbor_id) AS r
        FROM sims) WHERE r <= 3
    )"""

    def method_stats(name: str, mcte: str, tcte: str) -> str:
        return f"""
    SELECT '{name}' AS method,
           CAST(count(m.neighbor_id) AS BIGINT) AS hits,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(count(m.neighbor_id) AS DOUBLE) / count(*), 4)
             AS recall
    FROM {tcte} t LEFT JOIN {mcte} m
      ON m.query_id = t.query_id AND m.neighbor_id = t.neighbor_id"""

    return (
        "WITH truth_full AS "
        + truth_cte("")
        + ",\n    truth_sub AS "
        + truth_cte(" AND c.vec_id < 2000")
        + ",\n    m_ivf AS (SELECT query_id, neighbor_id FROM ("
        + _ann_ivf_oracle_sql(auto_nlist=True, query_cap=cap)
        + ") t),\n    m_pq AS (SELECT query_id, neighbor_id FROM ("
        + _ann_ivfpq_oracle_sql(auto_nlist=True, query_cap=cap)
        + ") t),\n    m_pq2 AS (SELECT query_id, neighbor_id FROM ("
        + _ann_ivfpq_oracle_sql(
            auto_nlist=True, query_cap=cap, m=ANN_PQ2_M, ksz=ANN_PQ2_KSZ,
            nprobe=ANN_PQ2_NPROBE, rerank=ANN_PQ2_RERANK,
        )
        + ") t),\n    m_lsh AS (SELECT query_id, neighbor_id FROM ("
        + _ann_lsh_oracle_sql(query_cap=cap)
        + ") t)"
        + method_stats("ivf", "m_ivf", "truth_full")
        + "\n    UNION ALL"
        + method_stats("ivfpq", "m_pq", "truth_full")
        + "\n    UNION ALL"
        + method_stats("ivfpq_rerank", "m_pq2", "truth_full")
        + "\n    UNION ALL"
        + method_stats("lsh", "m_lsh", "truth_sub")
    )


def q_bpe_token_count(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    tc = X.bpe_ish_token_count(docs, "text")
    return tc.groupBy("lang").agg(
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
    )


# --- multimodal ------------------------------------------------------------


def q_media_metadata(spark, sf_dir):
    # Binary payload + typed metadata struct; metadata-only aggregation
    # never touches the payload column (column pruning).
    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    meta = M.attach_media_metadata(docs, "payload", "image", "png")
    return meta.groupBy("lang").agg(
        F.sum(F.col("payload_meta.n_bytes")).alias("total_bytes"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_byte_histogram_features(spark, sf_dir):
    # Deterministic fake feature extractor over binary payloads
    # (mapInPandas batch contract). Feature 7 = fraction of bytes in
    # [96, 112) (lowercase a..o in UTF-8); the float32 quantization is
    # reproduced in SQL with CAST(.. AS REAL).
    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    feats = M.extract_byte_histogram_features(docs, "payload", "doc_id")
    return feats.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.element_at("features", 7)), 3).alias("sum_f7"),
    )


def q_quantize_embeddings(spark, sf_dir):
    # int8 symmetric quantization with engine-portable floor(t + 0.5)
    # arithmetic: per-vector code sum and rounded scale are replayed
    # exactly in SQL (max|x| is order-independent, unlike sums).
    emb = _read(spark, sf_dir, "embeddings")
    q = S.quantize_embeddings(emb, "embedding", "vec_id")
    # explode + hash-agg (codegen), NOT F.aggregate — Catalyst interprets
    # higher-order-function lambdas per element (SCALE.md pitfall).
    ex = q.select(
        "vec_id", F.round("scale", 6).alias("scale_r"),
        F.explode("codes").alias("__c__"),
    )
    return ex.groupBy("vec_id", "scale_r").agg(
        F.sum(F.col("__c__").cast("long")).alias("code_sum")
    )


def q_decode_image(spark, sf_dir):
    # Real 24-bit BMP decode over synthesized spec-conformant payloads:
    # per-doc dimensions and the exact decoded pixel sum (row padding and
    # the bottom-up flip must be handled right) are recomputed in SQL
    # from the same integer formulas.
    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_bmp(1 + int(d) % 7, 1 + int(d) % 5, int(d))
                for d in pdf["doc_id"]
            ]
            yield pdf

    from pyspark.sql import types as T

    with_bmp = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    dec = M.decode_image(with_bmp, "payload")
    return dec.select("doc_id", "height", "width", "channels", "pixel_sum")


def q_decode_image_png(spark, sf_dir):
    # Real 8-bit PNG decode (stdlib zlib inflate + Sub/Up/Average/Paeth
    # unfiltering, PLTE palette mapping) over synthesized
    # spec-conformant payloads whose scanline filters cycle through all
    # five types; color type varies per doc (gray / RGB / RGBA /
    # palette). The exact decoded sample sum is recomputed in SQL from
    # the same integer formulas — it only matches if every filter
    # inverse and the palette lookup are right.
    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_png(
                    1 + int(d) % 7,
                    1 + int(d) % 5,
                    int(d),
                    color_type=[0, 2, 6, 3][int(d) % 4],
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    from pyspark.sql import types as T

    with_png = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    dec = M.decode_image(with_png, "payload")
    return dec.select("doc_id", "height", "width", "channels", "pixel_sum")


def q_decode_image_gif(spark, sf_dir):
    # Real GIF decode: spec-conformant GIF89a payloads (global color
    # table, comment extension, real LZW compression) synthesized from
    # integer formulas; the decoded palette-mapped pixel sum replays in
    # SQL. It only matches if the variable-width LZW decode, sub-block
    # reassembly, and palette lookup are all right.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = _read(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_gif(2 + int(d) % 9, 2 + int(d) % 6, int(d))
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_gif = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    dec = M.decode_image(with_gif, "payload")
    return dec.select("doc_id", "height", "width", "channels", "pixel_sum")


def q_decode_image_jpeg(spark, sf_dir):
    # Real baseline JPEG decode (canonical-Huffman entropy decode +
    # dequantize + exact IDCT; interleaved-MCU color with BT.601
    # conversion and box chroma upsampling) over synthesized
    # spec-conformant DC-only payloads: a DC-only block IDCTs to an
    # exactly uniform 128 + k surface, and color payloads carry neutral
    # chroma (R=G=B=Y exactly), so decoded pixel sums replay in SQL
    # with no lossy-codec ambiguity. doc_id % 5 == 0 -> 4:4:4 color,
    # == 1 -> 4:2:0 color (16-multiple dims), == 2 -> grayscale with
    # restart markers every 2 MCUs (byte alignment + DC resets), else
    # plain grayscale. First 300 docs (the entropy decode is a
    # per-payload bit loop, the documented non-production path).
    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300"
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 5 == 1:  # 4:2:0 needs 16-multiple dimensions
                    payloads.append(
                        M.synthesize_jpeg(
                            16 * (1 + d % 3), 16 * (1 + d % 2), d,
                            color=True, subsampling="420",
                        )
                    )
                else:
                    payloads.append(
                        M.synthesize_jpeg(
                            8 * (1 + d % 3), 8 * (1 + d % 2), d,
                            color=d % 5 == 0,
                            restart_interval=2 if d % 5 == 2 else 0,
                        )
                    )
            pdf["payload"] = payloads
            yield pdf

    from pyspark.sql import types as T

    with_jpeg = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    dec = M.decode_image(with_jpeg, "payload")
    return dec.select("doc_id", "height", "width", "channels", "pixel_sum")


def q_decode_image_progressive(spark, sf_dir):
    # Real PROGRESSIVE JPEG decode (SOF2, multi-scan coefficient
    # accumulation): spectral-selection payloads — a DC scan followed
    # by AC band scans carried as EOBn end-of-band RUNS across every
    # block. DC-only blocks IDCT to an exactly uniform 128 + k_b
    # surface, so pixel sums replay in SQL with the same integer
    # formula as the baseline JPEG oracle — but only if the multi-scan
    # progressive entropy decode (including the EOB-run bookkeeping)
    # reconstructs every coefficient exactly. doc_id % 4 == 1 is 4:4:4
    # COLOR progressive (interleaved 3-component DC scan, one AC scan
    # per component); doc_id % 4 == 3 is 4:2:0 SUBSAMPLED color
    # progressive at 16-multiple dims (interleaved 4-luma+Cb+Cr DC
    # MCUs, single-component AC band scans over each component's
    # natural block raster) — both with neutral chroma, so R=G=B=Y
    # exactly and the pixel sum is 3x the grayscale formula over the
    # full-resolution luma block grid. The full
    # successive-approximation script (DC/AC refinement scans,
    # correction bits) is unit-tested against an independent IDCT
    # reference in tests/test_multimodal.py — per-pixel half-to-even
    # rounding of AC cosines has no clean SQL replay. First 200 docs
    # (bit-loop decode, the documented non-production path).
    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 200"
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_progressive_jpeg(
                    (16 if int(d) % 4 == 3 else 8) * (1 + int(d) % 3),
                    (16 if int(d) % 4 == 3 else 8) * (1 + int(d) % 2),
                    int(d),
                    color=int(d) % 2 == 1,
                    subsampling="420" if int(d) % 4 == 3 else "444",
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    from pyspark.sql import types as T

    with_jpeg = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    dec = M.decode_image(with_jpeg, "payload")
    return dec.select("doc_id", "height", "width", "channels", "pixel_sum")


def q_sample_video_frames(spark, sf_dir):
    # Real frame sampling over synthesized codec-free raw-RGB24 videos:
    # every 2nd frame's exact pixel sum is recomputed in SQL from the
    # same integer formula (first 200 docs; frame counts vary per doc).
    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 200"
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_raw_video(
                    1 + int(d) % 4, 1 + int(d) % 3, 1 + int(d) % 6, int(d)
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    from pyspark.sql import types as T

    with_vid = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    frames = M.sample_video_frames(with_vid, "payload", every_n_frames=2)
    return frames.select(
        "doc_id", "frame_index", "height", "width", "frame_pixel_sum"
    )


def q_cosine_dedup(spark, sf_dir):
    # Embedding-cosine near-dup removal through the LSH-bucketed SCALE
    # path (drop a row iff some smaller-id row shares a bucket in any of
    # 3 tables and round(cosine, 6) >= 0.97): deterministic Rademacher
    # planes (LCG formula) and auto bucket width ceil(log2(n/128)) are
    # both replayed exactly in SQL, so the whole candidate generation is
    # oracle-checked — the same graded-surface treatment as
    # chunk_vector_topk's IVF routing (r4 verdict #2/#3 pattern). The
    # exact O(n^2) pairwise path remains the test-side cross-check
    # (tests/test_pipeline_operators.py::test_cosine_dedup_lsh_vs_exact).
    emb = _read(spark, sf_dir, "embeddings")
    kept = D.embedding_cosine_dedup(
        emb, "embedding", "vec_id", threshold=0.97,
        use_lsh=True, bits=None, plane_kind="rademacher", round_scores=True,
    )
    return kept.groupBy("label").agg(F.count(F.lit(1)).alias("n_kept"))


def q_dsir_selection(spark, sf_dir):
    # DSIR importance resampling (Xie et al. 2023): docs with
    # doc_id % 3 == 0 play the TARGET corpus; the rest is the raw pool.
    # Hashed-unigram (md5-60bit % 1024) models with +1 smoothing,
    # per-doc log-weight sums, deterministic Gumbel top-60 — every step
    # (including the Gumbel draw, derived from the md5-uniform of
    # doc_id) replays in SQL; scores are rounded to 6 before ranking so
    # 1-ulp libm differences between engines cannot flip the order.
    from ..utils import spread_rows

    # Guarded row spread (round-8 found-and-fixed #4): the tokenize/
    # explode stage otherwise inherits file-split parallelism.
    docs = spread_rows(
        _read(spark, sf_dir, "documents"),
        min_files=spark.sparkContext.defaultParallelism,
    )
    corpus = docs.filter("doc_id % 3 != 0")
    target = docs.filter("doc_id % 3 = 0")
    sel = P.dsir_resample(
        corpus, target, "text", "doc_id", n=60, n_buckets=1024,
        smoothing=1.0, temperature=1.0,
    )
    return sel.groupBy("lang").agg(F.count(F.lit(1)).alias("n_selected"))


_DSIR_ORACLE = """
    WITH corpus AS (
      SELECT doc_id, lang, lower(trim(text)) AS t FROM documents
      WHERE doc_id % 3 <> 0
    ), tgt AS (
      SELECT doc_id, lower(trim(text)) AS t FROM documents
      WHERE doc_id % 3 = 0
    ), ctok AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
      FROM (SELECT doc_id, unnest(string_split_regex(t, '\\s+')) AS tok
            FROM corpus)
      WHERE tok <> ''
    ), ttok AS (
      SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
      FROM (SELECT unnest(string_split_regex(t, '\\s+')) AS tok FROM tgt)
      WHERE tok <> ''
    ), cmodel AS (SELECT b, count(*) AS c FROM ctok GROUP BY b),
    tmodel AS (SELECT b, count(*) AS c FROM ttok GROUP BY b),
    ctot AS (SELECT ln(sum(c) + 1024.0) AS lt FROM cmodel),
    ttot AS (SELECT ln(sum(c) + 1024.0) AS lt FROM tmodel),
    dom AS (SELECT CAST(range AS BIGINT) AS b FROM range(0, 1024)),
    ratio AS (
      SELECT dom.b,
             (coalesce(ln(tmodel.c + 1.0), ln(1.0)) - ttot.lt)
           - (coalesce(ln(cmodel.c + 1.0), ln(1.0)) - ctot.lt) AS lr
      FROM dom
      LEFT JOIN tmodel ON tmodel.b = dom.b
      LEFT JOIN cmodel ON cmodel.b = dom.b
      CROSS JOIN ctot CROSS JOIN ttot
    ), w AS (
      SELECT corpus.doc_id, corpus.lang,
             coalesce(s.logw, 0.0) AS logw
      FROM corpus
      LEFT JOIN (
        SELECT ctok.doc_id, sum(ratio.lr) AS logw
        FROM ctok JOIN ratio ON ratio.b = ctok.b
        GROUP BY ctok.doc_id
      ) s ON s.doc_id = corpus.doc_id
    ), scored AS (
      SELECT doc_id, lang,
        round(logw
          - ln(-ln(('0x' || substr(md5(doc_id::VARCHAR || ':dsir'),
                                   1, 13))::BIGINT
                   / 4503599627370496.0 + 1e-300)), 6) AS score
      FROM w
    ), ranked AS (
      SELECT lang,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_selected
    FROM ranked WHERE rk <= 60 GROUP BY lang
"""


def q_normalize_text_stats(spark, sf_dir):
    # CCNet/C4-style normalization over deterministically "dirtied"
    # text (curly quotes + em dash + a control char + double space +
    # uppercased head injected in-query, since the synthetic corpus is
    # clean ASCII): per-lang char totals before/after prove every
    # mapping step; the SQL oracle replays the same translate + regexp
    # chain (special chars spelled chr(...) on both sides' oracle).
    from . import text as X

    docs = _read(spark, sf_dir, "documents")
    dirty = docs.withColumn(
        "text",
        F.concat(
            F.lit("\u201c"),
            F.upper(F.substring("text", 1, 10)),
            F.lit("\u201d\u2014\x07 "),
            F.expr("substr(text, 11)"),
            F.lit("  "),
        ),
    )
    out = X.normalize_text(dirty, "text")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("chars_dirty"),
        F.sum(F.length("text_norm")).alias("chars_norm"),
    )


def q_html_extract_stats(spark, sf_dir):
    # HTML -> text extraction (crawl-pipeline stage 0): each doc's text
    # is wrapped in a full synthetic page IN-QUERY via Catalyst concat —
    # comments, script/style with HTML-hostile content (a<b, braces,
    # &amp; inside code), attributes, block structure, named entities,
    # and the doc text HTML-escaped exactly as a generator would.
    # html_extract must drop the non-prose containers, map block tags
    # to newlines, and decode entities; md5 of the extracted string is
    # the grade, so the oracle (which states the EXPECTED text rather
    # than mirroring the regex chain) proves exact extraction.
    docs = _read(spark, sf_dir, "documents").filter("doc_id % 7 = 3")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit(
            '<html><!-- nav & junk --><head><title>T</title>'
            '<script type="text/x">if (a<b && c>d) { f("&amp;"); }'
            "</script><style>p { c: r; }</style></head>"
            '<body id="b"><h1>Title &amp; Stats</h1><p>'
        ),
        esc,
        F.lit('</p><div class="foot">Copyright &copy; '),
        (F.lit(2000) + F.col("doc_id") % 30).cast("string"),
        F.lit(" &lt;Corp&gt;</div>5 &lt; 6<br/>end</body></html>"),
    )
    out = X.html_extract(docs.withColumn("html", page), "html", "t")
    return out.select(
        "doc_id",
        "lang",
        F.length("t").alias("n_chars"),
        F.md5(F.col("t")).alias("fp"),
    )


def q_warc_ingest_stats(spark, sf_dir):
    # Crawl-archive ingestion end to end (the TRUE stage-0 entry
    # point): synthesize a full HTML page per document (the
    # html_extract_stats template), WRITE the corpus as WARC/1.0
    # shards — one gzip member per record, the Common Crawl layout —
    # then READ the archives back (paths shipped to tasks, records
    # gzip-streamed executor-side, never binaryFile), recover doc
    # identity from the crawled URL, and run html_extract on the
    # fetched body. Grade: per-record md5 of the extracted text (the
    # strictest value check) plus HTTP status and payload byte count,
    # so the oracle proves byte-exact page survival through
    # gzip/WARC/HTTP framing AND exact extraction after the round
    # trip. Sources: `sources/warc.py`.
    import tempfile

    from ..sources import warc as WRC

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 3 = 1")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit(
            '<html><!-- nav & junk --><head><title>T</title>'
            '<script type="text/x">if (a<b && c>d) { f("&amp;"); }'
            "</script><style>p { c: r; }</style></head>"
            '<body id="b"><h1>Title &amp; Stats</h1><p>'
        ),
        esc,
        F.lit('</p><div class="foot">Copyright &copy; '),
        (F.lit(2000) + F.col("doc_id") % 30).cast("string"),
        F.lit(" &lt;Corp&gt;</div>5 &lt; 6<br/>end</body></html>"),
    )
    staged = docs.select(
        F.concat(
            F.lit("http://crawl.test/"), F.col("lang"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        page.alias("html"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_warc_{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    # Shard count scales with corpus size (write/read are
    # single-threaded per shard); the oracle is per-record, so the
    # shard layout is free to scale without value impact.
    WRC.write_warc(
        staged, path, "url", "html",
        n_shards=P.derive_n_shards(docs.count()),
    )
    crawled = WRC.read_warc(spark, path)
    extracted = X.html_extract(crawled, "html", "t")
    return extracted.select(
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 2)
        .cast("long")
        .alias("doc_id"),
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 1).alias("lang"),
        "http_status",
        F.col("payload_bytes").cast("long").alias("payload_bytes"),
        F.length("t").alias("n_chars"),
        F.md5(F.col("t")).alias("fp"),
    )


def q_warc_http_framing_stats(spark, sf_dir):
    # Real-crawl HTTP body framing round trip: Common Crawl stores
    # responses AS FETCHED, so chunked transfer coding and compressed
    # bodies (Content-Encoding: gzip/deflate) are the common case.
    # Each document is written with a framing chosen by doc_id % 5 —
    # identity | chunked | gzip | deflate | chunked+gzip — and read
    # back through the dechunk/decompress path (`sources/warc.py`
    # `_parse_http`). Grade: per-record md5 + length of the extracted
    # text (framing-invariant — proves the body survived EXACTLY),
    # plus the exact on-wire payload byte count for the two framings
    # whose size is replayable in SQL (identity, chunked — the
    # chunk-overhead arithmetic proves chunked framing actually
    # happened on the wire; compressed sizes are not SQL-expressible
    # so those rows grade NULL there and rely on the fp).
    import tempfile

    from ..sources import warc as WRC
    from ..sources.warc import _FRAMINGS

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 3 = 0")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit("<html><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        esc,
        F.lit("</p></body></html>"),
    )
    framing_of = lambda c: F.element_at(  # noqa: E731
        F.array(*[F.lit(x) for x in _FRAMINGS]), (c % 5 + 1).cast("int")
    )
    staged = docs.select(
        F.concat(
            F.lit("http://crawl.test/"), F.col("lang"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        page.alias("html"),
        framing_of(F.col("doc_id")).alias("fr"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_warcfr_{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    WRC.write_warc(
        staged, path, "url", "html",
        n_shards=P.derive_n_shards(docs.count()),
        framing_column="fr",
    )
    crawled = WRC.read_warc(spark, path)
    extracted = X.html_extract(crawled, "html", "t")
    doc_id = (
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 2).cast("long")
    )
    return extracted.select(
        doc_id.alias("doc_id"),
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 1).alias("lang"),
        framing_of(doc_id).alias("framing"),
        "http_status",
        F.when(
            framing_of(doc_id).isin("identity", "chunked"),
            F.col("payload_bytes"),
        ).cast("long").alias("framed_bytes"),
        F.length("t").alias("n_chars"),
        F.md5(F.col("t")).alias("fp"),
    )


def q_wet_roundtrip_stats(spark, sf_dir):
    # WET sidecar round trip — the OTHER end of the crawl story:
    # pipelines don't just read archives, they PUBLISH extracted text
    # as WARC/1.0 conversion records (Common Crawl's *.warc.wet.gz).
    # Write the document texts as WET shards keyed by crawl URL, read
    # them back as conversion records, and grade byte-exact survival
    # (payload bytes + md5), plus the record-id convention that links
    # a WET record to its page (md5 of 'conversion:'+url — replayable
    # in SQL). The payload is length-framed, so text containing CR/LF
    # or even WARC/ lines round-trips exactly. Sources:
    # `sources/warc.py` write_wet/read_warc.
    import tempfile

    from ..sources import warc as WRC

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 4 = 1")
    staged = docs.select(
        F.concat(
            F.lit("http://crawl.test/"), F.col("lang"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_wet_{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    WRC.write_wet(
        staged, path, "url", "text",
        n_shards=P.derive_n_shards(docs.count()),
    )
    got = WRC.read_warc(spark, path, record_types=("conversion",))
    return got.select(
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 2)
        .cast("long")
        .alias("doc_id"),
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 1).alias("lang"),
        "warc_type",
        "record_id",
        F.col("payload_bytes").cast("long").alias("payload_bytes"),
        F.length("html").alias("n_chars"),
        F.md5(F.col("html")).alias("fp"),
    )


def q_streaming_wet_publish(spark, sf_dir):
    # Stage-0 EXIT as a stream: documents arrive on a checkpointed
    # file stream (two parquet splits, maxFilesPerTrigger=1 -> the
    # publish genuinely spans micro-batches) and every micro-batch
    # PUBLISHES its extracted text as WET conversion-record shards via
    # foreachBatch(write_wet) into a per-batch directory — the live
    # counterpart of wet_roundtrip_stats, closing the streaming crawl
    # story at BOTH ends (manifest-stream ingest in, sidecar publish
    # out). Shard bytes are deterministic WITHIN a batch (write_wet's
    # conventions); the batch SPLIT is an execution detail, so the
    # grade is the batch-split-INVARIANT record set: per-record md5 +
    # byte counts of everything published, read back with the
    # recursive reader. Sources: `sources/warc.py`.
    import tempfile

    from ..sources import warc as WRC

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 4 = 3")
    tmp = tempfile.mkdtemp(prefix="tas_wetpub_")
    stage = os.path.join(tmp, "docs")
    os.makedirs(stage)
    # Stage the two micro-batch files with driver-side Arrow writes
    # (one collect instead of a repartition(2) Spark write job). The
    # halves differ from the old shuffle split, but the grade is the
    # batch-split-INVARIANT record set, so any two-file split grades
    # identically.
    import pyarrow.parquet as pq

    tbl = docs.select("doc_id", "lang", "text").toArrow()
    n_docs = tbl.num_rows
    half_rows = max(n_docs // 2, 1)
    pq.write_table(tbl.slice(0, half_rows), os.path.join(stage, "b0.parquet"))
    pq.write_table(tbl.slice(half_rows), os.path.join(stage, "b1.parquet"))
    pub = os.path.join(tmp, "pub")
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        # round-8 #4: spread each micro-batch's rows across cores
        .repartition(spark.sparkContext.defaultParallelism)
    )
    shards = P.derive_n_shards(max(n_docs // 2, 1))

    def _publish(bdf, bid):
        staged = bdf.select(
            F.concat(
                F.lit("http://crawl.test/"), F.col("lang"), F.lit("/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            "text",
        )
        WRC.write_wet(
            staged, os.path.join(pub, f"batch-{bid:05d}"),
            "url", "text", n_shards=shards,
        )

    q = (
        stream.writeStream.foreachBatch(_publish)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = WRC.read_warc(
        spark, pub, record_types=("conversion",), recursive=True
    )
    return got.select(
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 2)
        .cast("long")
        .alias("doc_id"),
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 1).alias("lang"),
        "warc_type",
        F.col("payload_bytes").cast("long").alias("payload_bytes"),
        F.length("html").alias("n_chars"),
        F.md5(F.col("html")).alias("fp"),
    )


def q_wat_roundtrip_stats(spark, sf_dir):
    # WAT sidecar round trip — the third member of the crawl triple
    # (WARC raw / WAT metadata / WET text): per-page metadata JSON
    # written as WARC/1.0 metadata records (shard-*.warc.wat.gz),
    # read back, and PARSED — the grade covers the publish side (the
    # record-id/refers-to conventions, byte counts) AND the consume
    # side (get_json_object field extraction on the fetched payload).
    # The JSON is built by explicit concat of escaping-free fields
    # (url/lang/ints/md5) so DuckDB replays the bytes exactly.
    # Sources: `sources/warc.py` write_wat/read_warc.
    import tempfile

    from ..sources import warc as WRC

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 4 = 2")
    staged = docs.select(
        F.concat(
            F.lit("http://crawl.test/"), F.col("lang"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('{"url":"http://crawl.test/'),
            F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
            F.lit('","lang":"'), F.col("lang"),
            F.lit('","n_chars":'), F.length("text").cast("string"),
            F.lit(',"fp":"'), F.md5(F.col("text")),
            F.lit('"}'),
        ).alias("meta_json"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_wat_{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    WRC.write_wat(
        staged, path, "url", "meta_json",
        n_shards=P.derive_n_shards(docs.count()),
    )
    got = WRC.read_warc(spark, path, record_types=("metadata",))
    return got.select(
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 2)
        .cast("long")
        .alias("doc_id"),
        "warc_type",
        "record_id",
        F.col("payload_bytes").cast("long").alias("payload_bytes"),
        F.get_json_object("html", "$.lang").alias("lang"),
        F.get_json_object("html", "$.n_chars")
        .cast("long")
        .alias("n_chars"),
        F.get_json_object("html", "$.fp").alias("fp"),
        (F.get_json_object("html", "$.url") == F.col("url"))
        .alias("url_consistent"),
    )


def q_robots_gate_stats(spark, sf_dir):
    # robots.txt politeness gate (operators/robots.py): synthesize one
    # robots.txt per domain — the 'en' domain has a blanket
    # `Disallow: /` for * PLUS an exact 'trainbot' group (so the gate
    # must IGNORE the * group for the named agent, RFC 9309 group
    # selection); every other domain exercises longest-prefix-match
    # with the allow-beats-disallow tie-break (/private disallowed,
    # /private/ok re-allowed). URLs fan out over five path buckets per
    # doc. The oracle does NOT mirror the implementation: it states
    # the expected allow/deny truth table per (domain-class, bucket)
    # from the RFC semantics directly, so parser and gate are graded
    # against an independent reading of the spec. Full parser
    # semantics (groups, comments, CRLF, empty Disallow, agent
    # case-insensitivity) are unit-locked in tests/test_robots.py.
    from . import robots as RB

    docs = _read(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") % 5).alias("bucket")
    path = F.concat(
        F.element_at(
            F.array(
                F.lit("/public/"), F.lit("/private/"),
                F.lit("/private/ok/"), F.lit("/no-train/"), F.lit("/"),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ),
        F.col("doc_id").cast("string"),
    )
    urls = docs.select(
        "lang",
        bucket,
        F.concat(F.col("lang"), F.lit(".example")).alias("domain"),
        path.alias("path"),
    )
    robots_df = urls.select("domain").distinct().withColumn(
        "robots",
        F.when(
            F.col("domain") == "en.example",
            F.lit(
                "User-agent: *\nDisallow: /\n\n"
                "User-agent: trainbot\nDisallow: /no-train\n"
            ),
        ).otherwise(
            F.lit(
                "User-agent: *\nDisallow: /private\n"
                "Allow: /private/ok\n"
            )
        ),
    )
    rules = RB.parse_robots(robots_df, "domain", "robots")
    gated = RB.robots_gate(
        urls, rules, "domain", "path", user_agent="trainbot"
    )
    return gated.groupBy("lang", "bucket", "crawl_allowed").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "lang",
        F.col("bucket").cast("long").alias("bucket"),
        "crawl_allowed",
        F.col("n").cast("long").alias("n"),
    )


def q_crawl_schedule_stats(spark, sf_dir):
    # Crawl SCHEDULING composition (round 9): robots_gate x
    # crawl_directives on the same robots corpus — the number a crawl
    # planner actually needs: per-domain allowed-URL count x
    # politeness delay = serial fetch time. The synthesis also
    # exercises a subtle RFC interaction end to end: the non-vowel
    # domains' trainbot group carries ONLY a Crawl-delay (no
    # Allow/Disallow), so for the GATE it is an empty exact group
    # (allow-'' sentinel -> supersedes the * rules -> everything
    # allowed) while for the DIRECTIVES it supplies the governing
    # delay — two different selections from one group, both graded.
    # Vowel domains have no trainbot group: the * rules (/private
    # denied, /private/ok re-allowed) and the * delay (10) govern.
    from . import robots as RB

    docs = _read(spark, sf_dir, "documents")
    path = F.element_at(
        F.array(
            F.lit("/public/"), F.lit("/private/"),
            F.lit("/private/ok/"), F.lit("/no-train/"), F.lit("/"),
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    urls = docs.select(
        F.concat(F.col("lang"), F.lit(".example")).alias("domain"),
        F.concat(path, F.col("doc_id").cast("string")).alias("path"),
    )
    domains = docs.select(
        F.concat(F.col("lang"), F.lit(".example")).alias("domain"),
        "lang",
    ).distinct()
    vowel = F.substring("lang", 1, 1).isin("a", "e", "i", "o", "u")
    exact_delay = (F.length("domain") % 5 + 1).cast("string")
    robots_df = domains.withColumn(
        "robots",
        F.concat(
            F.lit("User-agent: *\nCrawl-delay: 10\n"
                  "Disallow: /private\nAllow: /private/ok\n"),
            F.when(vowel, F.lit("")).otherwise(
                F.concat(
                    F.lit("\nUser-agent: trainbot\nCrawl-delay: "),
                    exact_delay, F.lit("\n"),
                )
            ),
        ),
    ).drop("lang")
    rules = RB.parse_robots(robots_df, "domain", "robots")
    gated = RB.robots_gate(
        urls, rules, "domain", "path", user_agent="trainbot"
    )
    allowed = gated.filter("crawl_allowed").groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_allowed")
    )
    dirs = RB.crawl_directives(
        robots_df, "domain", "robots", user_agent="trainbot"
    )
    return allowed.join(dirs, "domain").select(
        "domain",
        F.col("n_allowed").cast("long").alias("n_allowed"),
        "crawl_delay",
        (F.col("n_allowed") * F.col("crawl_delay")).alias(
            "fetch_seconds"
        ),
    )


def q_archive_fs_roundtrip_stats(spark, sf_dir):
    # Object-storage plumbing for the archive stack (sources/fs.py,
    # round 9): the WET sink and the WARC reader run against a
    # NON-file:// scheme end to end — a TAS_FS_ALIASES scheme
    # ('tasmock://') that the fs seam rewrites driver-side and
    # resolves through pyarrow.fs, the exact code path an s3:// or
    # gs:// URI takes (scheme parse -> alias/synonym rewrite ->
    # FileSystem.from_uri -> list/open/delete on a FileSystem object;
    # only the final FileSystem instance differs). Write the corpus
    # as WET conversion shards to tasmock://, read it back through
    # the same scheme, and grade per-record text survival (md5 +
    # length — the strictest value check). The loud remote-URI
    # rejections this replaces were warc.py:673-680 (r8).
    import tempfile

    from ..sources import fs as XF
    from ..sources import warc as WRC

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 4 = 1")
    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_fsmock_{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    os.makedirs(root, exist_ok=True)
    os.environ[XF.ALIAS_ENV] = f"tasmock=file://{root}"
    staged = docs.select(
        F.concat(
            F.lit("http://fs.test/"), F.col("lang"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("text"),
    )
    WRC.write_wet(
        staged, "tasmock://corpus/wet", "url", "text",
        n_shards=P.derive_n_shards(docs.count()),
    )
    back = WRC.read_warc(
        spark, "tasmock://corpus/wet", record_types=("conversion",)
    )
    return back.select(
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 2)
        .cast("long")
        .alias("doc_id"),
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 1).alias("lang"),
        F.length("html").alias("n_chars"),
        F.md5(F.col("html")).alias("fp"),
    )


def q_robots_wildcard_stats(spark, sf_dir):
    # RFC 9309 / Google-REP WILDCARD gating (operators/robots.py
    # round 9): every domain publishes the same wildcard robots —
    # `Disallow: /*.pdf$` ($-anchored), `Disallow: /private*/` +
    # `Allow: /private*/ok` (mid-rule * with the longest-as-written
    # tie-break), `Disallow: /cgi/fish*.php` (Google's fish example)
    # — plus a trailing EMPTY exact group for 'emptybot' (RFC group
    # selection: an empty named group exists, allows everything, and
    # supersedes *). URLs fan out over five path shapes per doc; the
    # corpus is gated TWICE: as 'trainbot' (governed by *, all
    # wildcard paths live) through the BROADCAST path, and as
    # 'emptybot' (empty exact group) through the FORCED SHUFFLE-JOIN
    # fallback (broadcast_rule_limit=0) — so both join strategies and
    # the empty-group selection are oracle-graded, not just
    # unit-locked. The oracle states the allow/deny truth table per
    # (agent, bucket) from an independent reading of the spec, NOT a
    # regex replay of the parser.
    from . import robots as RB

    docs = _read(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") % 5).alias("bucket")
    sid = F.col("doc_id").cast("string")
    path = F.element_at(
        F.array(
            F.concat(F.lit("/docs/"), sid, F.lit(".pdf")),
            F.concat(F.lit("/docs/"), sid, F.lit(".html")),
            F.concat(F.lit("/private-"), F.col("lang"), F.lit("/x/"), sid),
            F.concat(F.lit("/private-"), F.col("lang"), F.lit("/ok/"), sid),
            F.concat(F.lit("/cgi/fish"), sid, F.lit(".php")),
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    urls = docs.select(
        bucket,
        F.concat(F.col("lang"), F.lit(".example")).alias("domain"),
        path.alias("path"),
    )
    robots_df = urls.select("domain").distinct().withColumn(
        "robots",
        F.lit(
            "User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Disallow: /private*/\n"
            "Allow: /private*/ok\n"
            "Disallow: /cgi/fish*.php\n"
            "\n"
            "User-agent: emptybot\n"
        ),
    )
    rules = RB.parse_robots(robots_df, "domain", "robots")
    train = RB.robots_gate(
        urls, rules, "domain", "path", user_agent="trainbot",
        broadcast_rules=True,
    ).withColumn("agent", F.lit("trainbot"))
    empty = RB.robots_gate(
        urls, rules, "domain", "path", user_agent="emptybot",
        broadcast_rule_limit=0,
    ).withColumn("agent", F.lit("emptybot"))
    return train.unionByName(empty).groupBy(
        "agent", "bucket", "crawl_allowed"
    ).agg(F.count(F.lit(1)).alias("n")).select(
        "agent",
        F.col("bucket").cast("long").alias("bucket"),
        "crawl_allowed",
        F.col("n").cast("long").alias("n"),
    )


def q_crawl_politeness_stats(spark, sf_dir):
    # Crawl-scheduler metadata (operators/robots.py crawl_directives,
    # round 9): per-domain Crawl-delay with RFC group selection and
    # file-global Sitemap collection. Domains whose lang starts with
    # a vowel publish only a * group (delay 10, one sitemap); the
    # rest add an exact trainbot group (delay = len(domain) % 5 + 1,
    # a second sitemap) that must SUPERSEDE the * delay for the
    # trainbot agent. The oracle states the per-domain truth table
    # independently from the same arithmetic.
    from . import robots as RB

    docs = _read(spark, sf_dir, "documents")
    domains = docs.select(
        F.concat(F.col("lang"), F.lit(".example")).alias("domain"),
        F.col("lang"),
    ).distinct()
    vowel = F.substring("lang", 1, 1).isin("a", "e", "i", "o", "u")
    exact_delay = (F.length("domain") % 5 + 1).cast("string")
    robots_df = domains.withColumn(
        "robots",
        F.concat(
            F.lit("Sitemap: https://"), F.col("domain"),
            F.lit("/sitemap.xml\nUser-agent: *\nCrawl-delay: 10\n"
                  "Disallow: /private\n"),
            F.when(vowel, F.lit("")).otherwise(
                F.concat(
                    F.lit("\nUser-agent: trainbot\nCrawl-delay: "),
                    exact_delay,
                    F.lit("\nSitemap: https://"), F.col("domain"),
                    F.lit("/news.xml\n"),
                )
            ),
        ),
    )
    dirs = RB.crawl_directives(
        robots_df, "domain", "robots", user_agent="trainbot"
    )
    return dirs.select(
        "domain",
        "crawl_delay",
        F.size("sitemaps").cast("long").alias("n_sitemaps"),
    )


def q_crawl_funnel_stats(spark, sf_dir):
    # THE first-byte-to-funnel story, every round-7 piece composed:
    # pages (some stamped <meta name="robots" content="noindex">) are
    # written as WARC archives, read back via the streaming gzip
    # parser, and pushed through the politeness gate (html_metadata
    # noindex), token gate, length cap, and exact dedup — all in
    # mark-don't-drop provenance mode — ending in the survival funnel
    # with duplicate->keeper attribution. One oracle replays the WARC
    # round trip (expected text), the metadata gate, and the funnel's
    # lowest-set-bit arithmetic.
    import tempfile

    from . import provenance as PR
    from ..sources import warc as WRC

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 3 = 2")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    robots = F.when(
        F.col("doc_id") % 11 == 0,
        F.lit('<meta name="robots" content="noindex,nofollow">'),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit('<html><head><title>T</title>'),
        robots,
        F.lit('<style>p { c: r; }</style></head>'
              '<body id="b"><h1>Title &amp; Stats</h1><p>'),
        esc,
        F.lit('</p><div class="foot">Copyright &copy; '),
        (F.lit(2000) + F.col("doc_id") % 30).cast("string"),
        F.lit(" &lt;Corp&gt;</div>5 &lt; 6<br/>end</body></html>"),
    )
    staged = docs.select(
        F.concat(
            F.lit("http://crawl.test/"), F.col("lang"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        page.alias("html"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_crawl_funnel_{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    WRC.write_warc(
        staged, path, "url", "html",
        n_shards=P.derive_n_shards(docs.count()),
    )
    crawled = WRC.read_warc(spark, path)
    crawled = crawled.withColumn(
        "lang", F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 1)
    )
    meta = X.html_metadata(crawled, "html")
    extracted = X.html_extract(meta, "html", "t")
    with_nt = X.token_count(extracted, "t", "nt")
    flagged = PR.mark_stage(with_nt, 0, F.col("html_noindex"))
    flagged = PR.mark_stage(flagged, 1, F.col("nt") < 50)
    flagged = PR.mark_stage(flagged, 2, F.length("t") > 560)
    # Slim BEFORE the dedup window: the exchange must move
    # (url, lang, 16-byte md5, flags), never the full html page and
    # raw text — the md5(t) equivalence is the same one the
    # document_fingerprint dedup path already relies on. The funnel
    # only needs stage_flags/dup_of, so no join-back is required.
    slim = flagged.select(
        "url", "lang", F.md5("t").alias("fp"), "stage_flags"
    )
    flagged = PR.mark_duplicates(slim, ["lang", "fp"], "url", 3)
    flagged = flagged.persist()
    try:
        funnel = PR.provenance_funnel(
            flagged, ["noindex", "token_gate", "too_long", "exact_dup"]
        )
        nk = flagged.agg(
            F.countDistinct("dup_of").alias("nk")
        ).collect()[0]["nk"]
    finally:
        flagged.unpersist()
    return funnel.withColumn(
        "n_absorbing_keepers",
        F.when(F.col("stage") == 3, F.lit(int(nk)))
        .otherwise(F.lit(0))
        .cast("long"),
    )


def q_streaming_warc_ingest(spark, sf_dir):
    # LIVE crawl ingestion: the same WARC corpus as warc_ingest_stats,
    # but arriving as a STREAM — archives are announced on a manifest
    # stream (one path per line; the only scalable whole-file
    # streaming shape, since binaryFile cells are the measured
    # anti-pattern), read with maxFilesPerTrigger=1 so the two
    # manifest files process in separate micro-batches, parsed
    # executor-side by the exact batch kernel, extracted with the
    # stateless Catalyst chain, and aggregated per language across
    # micro-batches. Oracle: the batch SQL equivalent.
    import glob as _glob
    import shutil
    import tempfile
    import uuid

    from ..sources import warc as WRC

    docs = _read(spark, sf_dir, "documents").filter("doc_id % 3 = 1")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit(
            '<html><!-- nav & junk --><head><title>T</title>'
            '<script type="text/x">if (a<b && c>d) { f("&amp;"); }'
            "</script><style>p { c: r; }</style></head>"
            '<body id="b"><h1>Title &amp; Stats</h1><p>'
        ),
        esc,
        F.lit('</p><div class="foot">Copyright &copy; '),
        (F.lit(2000) + F.col("doc_id") % 30).cast("string"),
        F.lit(" &lt;Corp&gt;</div>5 &lt; 6<br/>end</body></html>"),
    )
    staged = docs.select(
        F.concat(
            F.lit("http://crawl.test/"), F.col("lang"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        page.alias("html"),
    )
    tmp = tempfile.mkdtemp(prefix="tas_stream_warc_")
    shards = os.path.join(tmp, "archives")
    n_docs = docs.count()
    WRC.write_warc(
        staged, shards, "url", "html",
        n_shards=P.derive_n_shards(n_docs),
    )
    paths = sorted(_glob.glob(os.path.join(shards, "*.warc.gz")))
    manifest = os.path.join(tmp, "manifest")
    os.makedirs(manifest)
    half = max(len(paths) // 2, 1)
    for i, chunk in enumerate((paths[:half], paths[half:])):
        if chunk:
            with open(os.path.join(manifest, f"m{i}.txt"), "w") as fh:
                fh.write("\n".join(chunk) + "\n")
    stream = WRC.read_warc_stream(
        spark, manifest, max_files_per_trigger=1
    )
    extracted = X.html_extract(stream, "html", "t")
    agg = extracted.groupBy(
        F.regexp_extract("url", r"/([a-z]+)/(\d+)$", 1).alias("lang")
    ).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.length("t")).alias("sum_extracted_chars"),
    )
    name = f"tas_stream_warc_{uuid.uuid4().hex[:8]}"
    from ..utils import stream_state_partitions

    # Aggregation state partitions sized to the archive volume, not
    # the session's batch shuffle setting.
    with stream_state_partitions(spark, rows=n_docs):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name).select(
        "lang", "n_records", "sum_extracted_chars"
    )


def q_c4_line_filter_stats(spark, sf_dir):
    # C4-style line-level cleaning: four boilerplate lines appended per
    # doc — one too short, one with the 'javascript' marker, one with a
    # brace, one clean 5-word keeper — so per-lang kept-line and
    # kept-char totals prove which lines each rule dropped.
    docs = _read(spark, sf_dir, "documents")
    dirty = docs.withColumn(
        "text_dirty",
        F.concat(
            F.col("text"),
            F.lit(
                "\nok bye"
                "\njavascript needed today ok"
                "\nbuy now { cheap }"
                "\nthis line has five words."
            ),
        ),
    )
    out = X.c4_line_filter(dirty, "text_dirty")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_kept_lines").cast("long").alias("total_kept_lines"),
        F.sum(F.length("text_clean")).alias("total_clean_chars"),
    )


def q_sentence_stats(spark, sf_dir):
    # Sentence segmentation (the unit C4's page rules actually count):
    # punctuation spliced in-query at fixed char positions (the corpus
    # text is unpunctuated), then split_sentences; per-lang totals
    # plus the summed FIRST-sentence length grade the boundary
    # positions, not just the counts.
    docs = _read(spark, sf_dir, "documents")
    spliced = docs.withColumn(
        "text2",
        F.concat(
            F.expr("substr(text, 1, 50)"),
            F.lit(". "),
            F.expr("substr(text, 51, 70)"),
            F.lit("! "),
            F.expr("substr(text, 121)"),
        ),
    )
    out = X.split_sentences(spliced, "text2")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_sentences").cast("long").alias("total_sentences"),
        F.sum(F.length(F.col("sentences")[0])).cast("long").alias(
            "sum_first_len"
        ),
        F.sum((F.col("n_sentences") >= 3).cast("long")).alias(
            "n_three_plus"
        ),
    )


def q_html_metadata_stats(spark, sf_dir):
    # Structured page metadata (the fields a crawler keys on before
    # reading body text): pages synthesized in-query — lang attribute
    # from the doc's lang column, title from the text head, canonical
    # link on doc_id % 3 == 0, robots-noindex on doc_id % 5 == 0 —
    # then html_metadata must get every field back out.
    docs = _read(spark, sf_dir, "documents")
    page = F.concat(
        F.lit('<html lang="'),
        F.col("lang"),
        F.lit('"><head><title>'),
        F.expr("substr(text, 1, 30)"),
        F.lit("</title>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<link rel="canonical" href="https://ex.com/'),
                F.col("doc_id").cast("string"),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit('<meta name="robots" content="noindex,nofollow">'),
        ).otherwise(F.lit("")),
        F.lit("</head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    out = X.html_metadata(docs.withColumn("html", page), "html")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("html_title")).alias("sum_title_chars"),
        F.count("html_canonical").alias("n_canonical"),
        F.sum(F.col("html_noindex").cast("long")).alias("n_noindex"),
        F.sum((F.col("html_lang") == F.col("lang")).cast("long")).alias(
            "n_lang_match"
        ),
    )


#: Fixed BM25 query set (terms from the synthetic corpus vocabulary).
BM25_QUERIES = [
    ("q1", "table scan"),
    ("q2", "hash join spark"),
    ("q3", "window sort batch"),
]


def q_bm25_topk(spark, sf_dir):
    # BM25 lexical retrieval (the sparse baseline next to the ANN
    # family): top-5 docs for three fixed queries; scores rounded to 6
    # BEFORE ranking, ties by doc id — the oracle replays the full
    # tf/df/dl pipeline and the Robertson idf in SQL.
    docs = _read(spark, sf_dir, "documents")
    return X.bm25_topk(docs, "text", "doc_id", BM25_QUERIES, k=5)


def q_script_profile_stats(spark, sf_dir):
    # Unicode-script profiling (the does-script-match-claimed-language
    # gate): Cyrillic / heavy CJK / Arabic+digit content injected per
    # doc_id residue — the CJK injection (400 chars) outweighs the
    # Latin body, so the argmax column is value-graded too, not just
    # the counts.
    from ..utils import spread_rows

    # Guarded row spread (round-8 found-and-fixed #4): regexp counting
    # over the full corpus otherwise runs at file-split parallelism.
    docs = spread_rows(
        _read(spark, sf_dir, "documents"),
        min_files=spark.sparkContext.defaultParallelism,
    )
    injected = docs.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 1, F.lit(" Привет мир"))
            .when(F.col("doc_id") % 4 == 2, F.expr("repeat('你好世界', 100)"))
            .when(F.col("doc_id") % 4 == 3, F.lit(" مرحبا 7"))
            .otherwise(F.lit("")),
        ),
    )
    prof = X.script_profile(injected, "text2")
    return prof.groupBy("lang", "script_main").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("script_latin").cast("long").alias("sum_latin"),
        F.sum("script_cyrillic").cast("long").alias("sum_cyrillic"),
        F.sum("script_cjk").cast("long").alias("sum_cjk"),
        F.sum("script_arabic").cast("long").alias("sum_arabic"),
        F.sum("script_digit").cast("long").alias("sum_digit"),
        F.sum("script_other").cast("long").alias("sum_other"),
    )


def q_crawl_prep_stats(spark, sf_dir):
    # End-to-end crawl preparation over the round-6 stage-0 surface:
    # page synthesis (with boilerplate divs INSIDE the body, so the
    # line filter has real work) -> html_extract -> c4_line_filter
    # (drops 'end', 'ok bye', the javascript marker line) -> token
    # gate -> exact dedup -> per-lang totals. One oracle replays the
    # whole chain, proving the operators compose, not just run alone.
    from . import dedup as D
    from ..utils import spread_rows

    # Guarded row spread (round-8 found-and-fixed #4, see
    # q_pipeline_provenance_stats): the heavy per-row chain below
    # otherwise runs at file-split parallelism — 1 core at sf10's
    # one-file corpus, 10 at sf100 — which also masqueraded as a
    # flattering sub-linear decade slope. No-op at real file counts.
    docs = spread_rows(
        _read(spark, sf_dir, "documents"),
        min_files=spark.sparkContext.defaultParallelism,
    )
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit(
            "<html><head><title>T</title><style>p{}</style></head>"
            "<body><h1>Title &amp; Stats</h1><p>"
        ),
        esc,
        F.lit(
            "</p><div>ok bye</div>"
            "<div>javascript needed today ok</div>"
            '<div class="foot">Copyright &copy; 2024 &lt;Corp&gt;</div>'
            "5 &lt; 6<br/>end</body></html>"
        ),
    )
    extracted = X.html_extract(docs.withColumn("html", page), "html", "t")
    # Round-8 found-and-fixed #5: downstream token_count + gate +
    # dedup-key references to the derived t_clean column each get the
    # FULL extract+line-filter expression chain re-inlined by Catalyst
    # (predicate pushdown substitutes through projections; HOF lambdas
    # defeat subexpression elimination), so the chain evaluated ~10x
    # per row — 87.6 s at sf10 where one evaluation costs 9.1 s. A
    # persist() barrier materializes t_clean ONCE; a repartition
    # barrier does NOT work (the gate pushes below the exchange and
    # re-inlines — measured 92 s). Numbers in SF1.md §round-8.
    cleaned = X.c4_line_filter(extracted, "t", "t_clean").select(
        "lang", "t_clean", "n_kept_lines"
    ).persist()
    try:
        gated = X.token_count(cleaned, "t_clean", "nt").filter(
            F.col("nt") >= 50
        )
        deduped = D.dedup_exact(gated, ["lang", "t_clean"])
        out = deduped.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("t_clean")).alias("sum_clean_chars"),
            F.sum("nt").cast("long").alias("sum_tokens"),
            F.sum("n_kept_lines").cast("long").alias("sum_kept_lines"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        cleaned.unpersist()
    return out


def q_pipeline_provenance_stats(spark, sf_dir):
    # Document-level pipeline PROVENANCE (operators/provenance.py):
    # the crawl-prep chain run in mark-don't-drop mode — every stage
    # sets its bit on the rows it would have dropped (token gate,
    # length cap, exact dedup with dup_of = absorbing keeper) — then
    # one aggregation yields the survival funnel: which stage killed
    # each doc (lowest set bit, so a doc dead at stage 0 never
    # double-counts at stage 2) and how many survive after each. The
    # oracle replays the bitmask with integer CASE arithmetic.
    from . import provenance as PR
    from ..utils import spread_rows

    # Round-8 found-and-fixed: the extraction chain (~160 us/doc of
    # regexp codegen) runs at FILE-SPLIT parallelism — a compressed
    # one-file (sf10) or 10-file (sf100) documents corpus serializes
    # 5M extractions onto a handful of cores, and THAT, not the dedup
    # window, was this key's sf100 cost (window slimmed in round 8;
    # measured decomposition in SF1.md). One cheap row spread before
    # the heavy projection; no-op when the scan already has >= cores
    # splits, as any real 100 TB corpus does.
    docs = spread_rows(
        _read(spark, sf_dir, "documents"),
        min_files=spark.sparkContext.defaultParallelism,
    )
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit(
            "<html><head><title>T</title><style>p{}</style></head>"
            "<body><h1>Title &amp; Stats</h1><p>"
        ),
        esc,
        F.lit(
            '</p><div class="foot">Copyright &copy; 2024 &lt;Corp&gt;'
            "</div>5 &lt; 6<br/>end</body></html>"
        ),
    )
    extracted = X.html_extract(docs.withColumn("html", page), "html", "t")
    with_nt = X.token_count(extracted, "t", "nt")
    flagged = PR.mark_stage(with_nt, 0, F.col("nt") < 50)
    flagged = PR.mark_stage(flagged, 1, F.length("t") > 560)
    # Slim BEFORE the dedup window (see q_crawl_funnel_stats): carry
    # only (doc_id, lang, md5(t), flags) through the exchange — the
    # synthesized html/text payloads stay behind the projection.
    slim = flagged.select(
        "doc_id", "lang", F.md5("t").alias("fp"), "stage_flags"
    )
    flagged = PR.mark_duplicates(slim, ["lang", "fp"], "doc_id", 2)
    flagged = flagged.persist()
    try:
        funnel = PR.provenance_funnel(
            flagged, ["token_gate", "too_long", "exact_dup"]
        )
        nk = flagged.agg(
            F.countDistinct("dup_of").alias("nk")
        ).collect()[0]["nk"]
    finally:
        flagged.unpersist()
    return funnel.withColumn(
        "n_absorbing_keepers",
        F.when(F.col("stage") == 2, F.lit(int(nk)))
        .otherwise(F.lit(0))
        .cast("long"),
    )


def q_quality_train_stats(spark, sf_dir):
    # In-engine quality-classifier training: 3 full-batch GD steps on
    # the rational-sigmoid linear model over quality_logit's features,
    # labels synthesized as (length > 400) so the gradient genuinely
    # moves. The oracle unrolls the identical 3 steps as CTEs — pure
    # +,*,/,abs arithmetic, no exp/log, so it replays to float
    # equality; per-step post-update weights AND pre-update mse are
    # all graded (rounded to 6 on both sides).
    docs = _read(spark, sf_dir, "documents").withColumn(
        "label", (F.length("text") > 400).cast("double")
    )
    out = X.quality_train_logreg(docs, "text", "label", steps=3, lr=1.0)
    return out.select(
        "step",
        F.round("bias", 6).alias("bias"),
        F.round("w_tokens", 6).alias("w_tokens"),
        F.round("w_mean_tok", 6).alias("w_mean_tok"),
        F.round("w_punct", 6).alias("w_punct"),
        F.round("mse", 6).alias("mse"),
    )


QUALITY_HO_STEPS, QUALITY_HO_LR = 30, 8.0


def q_quality_holdout_eval(spark, sf_dir):
    # GENERALIZATION grade for the quality classifier (VERDICT r7 #2):
    # deterministic md5-uniform 80/20 split (the split_dataset
    # primitive, so the split op itself gets oracle coverage), train
    # the rational-logistic model on the 80%, serve the UNSEEN 20%
    # through the real inference path (quality_logit with the trained
    # weights), grade accuracy + the confusion scalars. Label is
    # token-count >= 60 — a concept the three features CAN express
    # linearly, so the grade measures the trainer/serving machinery,
    # not concept mismatch (measured holdout accuracy 0.948 at
    # sf0.001 AND sf0.01; 3 steps/lr=1 was degenerate — predicts no
    # positives — hence the key-local 30-step/lr=8 recipe).
    docs = _read(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    docs = docs.withColumn("label", (toks >= 60).cast("double"))
    sp = P.split_dataset(
        docs, "doc_id", {"train": 0.8}, output_column="__split__"
    )
    train = sp.filter(F.col("__split__").eqNullSafe(F.lit("train")))
    hold = sp.filter(F.col("__split__").isNull())
    hist = X.quality_train_logreg(
        train, "text", "label", steps=QUALITY_HO_STEPS, lr=QUALITY_HO_LR
    )
    r = [
        row for row in hist.collect() if row["step"] == QUALITY_HO_STEPS
    ][0]
    b = round(r["bias"], 6)
    w1 = round(r["w_tokens"], 6)
    w2 = round(r["w_mean_tok"], 6)
    w3 = round(r["w_punct"], 6)
    scored = X.quality_logit(
        hold, "text",
        weights={
            "tokens_capped": w1,
            "mean_tok_capped": w2,
            "punct_ratio": w3,
        },
        bias=b,
    )
    correct = F.col("keep") == (F.col("label") == 1.0)
    out = scored.agg(
        F.count(F.lit(1)).alias("n_holdout"),
        F.sum((F.col("label") == 1.0).cast("long")).alias("n_pos"),
        F.sum(F.col("keep").cast("long")).alias("n_pred_pos"),
        F.sum(correct.cast("long")).alias("n_correct"),
    ).withColumn(
        "accuracy",
        F.round(
            F.col("n_correct").cast("double") / F.col("n_holdout"), 6
        ),
    )
    return out


def _quality_train_oracle_sql(steps: int = 3) -> str:
    """Unroll the GD trajectory as CTEs: w{k} holds the weights after
    step k, s{k} the gradient/mse aggregates computed at w{k-1}."""
    parts = [
        r"""
    WITH raw AS (
      SELECT length(text) AS nc,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> x <> '')) AS nt,
             length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
               AS np
      FROM documents
    ),
    f AS (
      SELECT CAST(nc > 400 AS DOUBLE) AS y,
             least(nt, 100) / 100.0 AS f1,
             least(CASE WHEN nt > 0 THEN CAST(nc AS DOUBLE) / nt
                        ELSE 0.0 END, 10.0) / 10.0 AS f2,
             CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc
                  ELSE 0.0 END AS f3
      FROM raw
    ),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    ]
    for k in range(1, steps + 1):
        p = k - 1
        parts.append(f""",
    s{k} AS (
      SELECT avg(e * e) AS mse, avg(g) AS gb,
             avg(g * f1) AS g1, avg(g * f2) AS g2, avg(g * f3) AS g3
      FROM (
        SELECT (0.5 * (1 + z / (1 + abs(z))) - y) AS e,
               2 * (0.5 * (1 + z / (1 + abs(z))) - y)
                 * (0.5 / ((1 + abs(z)) * (1 + abs(z)))) AS g,
               f1, f2, f3
        FROM (SELECT y, f1, f2, f3,
                     w{p}.b + w{p}.w1 * f1 + w{p}.w2 * f2 + w{p}.w3 * f3
                       AS z
              FROM f CROSS JOIN w{p}) t
      ) t2
    ),
    w{k} AS (
      SELECT w{p}.b - s{k}.gb AS b, w{p}.w1 - s{k}.g1 AS w1,
             w{p}.w2 - s{k}.g2 AS w2, w{p}.w3 - s{k}.g3 AS w3
      FROM w{p} CROSS JOIN s{k}
    )""")
    selects = [
        f"""
    SELECT CAST({k} AS INTEGER) AS step, round(w{k}.b, 6) AS bias,
           round(w{k}.w1, 6) AS w_tokens, round(w{k}.w2, 6) AS w_mean_tok,
           round(w{k}.w3, 6) AS w_punct, round(s{k}.mse, 6) AS mse
    FROM w{k} CROSS JOIN s{k}"""
        for k in range(1, steps + 1)
    ]
    return "".join(parts) + "\n    UNION ALL".join(selects)


def _quality_holdout_oracle_sql() -> str:
    """Replay q_quality_holdout_eval end to end: the md5-uniform split
    threshold (exactly split_dataset's arithmetic), the GD trajectory
    over the training subset with the key's lr, then round-6 weights
    scoring the holdout subset through the quality_logit arithmetic."""
    steps, lr = QUALITY_HO_STEPS, QUALITY_HO_LR
    parts = [
        r"""
    WITH raw AS (
      SELECT doc_id, length(text) AS nc,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> x <> '')) AS nt,
             len(string_split_regex(trim(text), '\s+')) AS nt_raw,
             length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
               AS np
      FROM documents
    ),
    f0 AS (
      SELECT CAST(nt_raw >= 60 AS DOUBLE) AS y,
             least(nt, 100) / 100.0 AS f1,
             least(CASE WHEN nt > 0 THEN CAST(nc AS DOUBLE) / nt
                        ELSE 0.0 END, 10.0) / 10.0 AS f2,
             CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc
                  ELSE 0.0 END AS f3,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                              1, 13))::BIGINT / 4503599627370496.0)
               < 0.8 AS is_train
      FROM raw
    ),
    f AS MATERIALIZED (SELECT y, f1, f2, f3 FROM f0 WHERE is_train),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    ]
    # MATERIALIZED: DuckDB inlines plain CTEs per reference, and the
    # w{k} chain references w{k-1} twice (via s{k} and directly), so a
    # 30-step unroll would expand 2^30 parquet scans without it.
    for k in range(1, steps + 1):
        p = k - 1
        parts.append(f""",
    s{k} AS MATERIALIZED (
      SELECT avg(g) AS gb,
             avg(g * f1) AS g1, avg(g * f2) AS g2, avg(g * f3) AS g3
      FROM (
        SELECT 2 * (0.5 * (1 + z / (1 + abs(z))) - y)
                 * (0.5 / ((1 + abs(z)) * (1 + abs(z)))) AS g,
               f1, f2, f3
        FROM (SELECT y, f1, f2, f3,
                     w{p}.b + w{p}.w1 * f1 + w{p}.w2 * f2 + w{p}.w3 * f3
                       AS z
              FROM f CROSS JOIN w{p}) t
      ) t2
    ),
    w{k} AS MATERIALIZED (
      SELECT w{p}.b - {lr!r} * s{k}.gb AS b,
             w{p}.w1 - {lr!r} * s{k}.g1 AS w1,
             w{p}.w2 - {lr!r} * s{k}.g2 AS w2,
             w{p}.w3 - {lr!r} * s{k}.g3 AS w3
      FROM w{p} CROSS JOIN s{k}
    )""")
    parts.append(f""",
    wr AS (SELECT round(b, 6) AS b, round(w1, 6) AS w1,
                  round(w2, 6) AS w2, round(w3, 6) AS w3
           FROM w{steps}),
    h AS (
      SELECT y, wr.b + wr.w1 * f1 + wr.w2 * f2 + wr.w3 * f3 AS z
      FROM f0 CROSS JOIN wr
      WHERE NOT is_train
    )
    SELECT CAST(count(*) AS BIGINT) AS n_holdout,
           CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pred_pos,
           CAST(sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           round(sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM h""")
    return "".join(parts)


#: Marker vocabularies for the trained language-id queries: per-language
#: function words deliberately DISJOINT from text.STOPWORDS, so the
#: stopword-vote heuristic cannot separate the corpus (it sees only the
#: shared filler vocabulary and votes 'en' for every doc via the filler
#: words "the"/"a") while the trained char-ngram model can.
LANG_MARKERS = {
    "de": "auch nach werden über einer wenn schon beim jahr mehr",
    "en": "about which their people would there been time more other",
    "es": "pero sobre entre hacer tiempo años donde mismo según cosa",
    "fr": "être cette aussi comme faire chose temps leur bien sans",
}
LANG_CLASSES = ["de", "en", "es", "fr"]
LANG_DIM, LANG_NGRAM, LANG_STEPS = 32, 3, 3
LANG_DENSITY = 80  # one marker block per this many source chars


def _lang_corpus(spark, sf_dir):
    """The script-confusable corpus both language queries train/grade
    on: a BALANCED synthetic label (doc_id % 4 — the source lang column
    is 44% en, which pins one-vs-rest GD to the majority class) whose
    language signal is injected as marker function words at realistic
    density (one 10-word block per ~80 chars, ~35% function-word mass,
    matching natural text). All four languages are Latin script."""
    docs = _read(spark, sf_dir, "documents")
    langs = F.array(*[F.lit(c) for c in LANG_CLASSES])
    marks = F.array(*[F.lit(LANG_MARKERS[c] + " ") for c in LANG_CLASSES])
    idx = (F.col("doc_id") % 4).cast("int") + 1
    reps = (F.lit(1) + F.expr(f"length(text) div {LANG_DENSITY}")).cast("int")
    return docs.select(
        F.element_at(langs, idx).alias("lang_true"),
        F.concat(
            F.repeat(F.element_at(marks, idx), reps), F.lower("text")
        ).alias("t"),
    )


def q_language_train_stats(spark, sf_dir):
    # In-engine TRAINED language-id (fastText recipe at engine scale:
    # hashed char-trigram features -> K one-vs-rest rational-logistic
    # models, full-batch GD, one partial aggregation per step). The
    # oracle unrolls the identical 3 steps over the identical
    # md5-hashed trigram features — pure +,*,/,abs arithmetic — and
    # grades every post-update weight and pre-update mse per class.
    corpus = _lang_corpus(spark, sf_dir)
    hist = X.language_train_logreg(
        corpus, "t", "lang_true", LANG_CLASSES,
        dim=LANG_DIM, n=LANG_NGRAM, steps=LANG_STEPS, lr=1.0,
    )
    return hist.select(
        "step",
        "class",
        F.round("bias", 6).alias("bias"),
        *[F.round(f"w{j}", 6).alias(f"w{j}") for j in range(LANG_DIM)],
        F.round("mse", 6).alias("mse"),
    )


def q_language_id_confusion(spark, sf_dir):
    # The trained model SERVING the language_id API, graded on what
    # users care about: the confusion matrix on the script-confusable
    # corpus (measured 100% diagonal at sf0.001-sf0.01 — the stopword
    # heuristic votes 'en' for every one of these docs; see
    # tests/test_language_id.py for the side-by-side). Weights are
    # rounded to 6 BEFORE serving on both sides, so both engines score
    # with bit-identical weights and the argmax replays exactly.
    # NOTE: this key grades IN-SAMPLE (train == serve rows) — kept for
    # round-to-round continuity; the generalization grade is
    # language_id_holdout_confusion, and the in-sample-vs-holdout
    # story (the 100% diagonal here depends on training-set class
    # balance being exact) is documented in COVERAGE.md.
    corpus = _lang_corpus(spark, sf_dir)
    # Featurize ONCE (persisted) and share the vec column between the
    # training scans and the serving pass.
    with_vec = X.hashed_char_ngrams(
        corpus, "t", dim=LANG_DIM, n=LANG_NGRAM, output_column="__cv__"
    ).persist()
    try:
        hist = X.language_train_logreg(
            with_vec, "t", "lang_true", LANG_CLASSES,
            dim=LANG_DIM, n=LANG_NGRAM, steps=LANG_STEPS, lr=1.0,
            vec_column="__cv__",
        )
        final = {
            r["class"]: (
                round(r["bias"], 6),
                [round(r[f"w{j}"], 6) for j in range(LANG_DIM)],
            )
            for r in hist.filter(F.col("step") == LANG_STEPS).collect()
        }
        served = X.language_id_trained(
            with_vec, "t", {c: final[c] for c in LANG_CLASSES},
            dim=LANG_DIM, n=LANG_NGRAM, vec_column="__cv__",
        )
        out = served.groupBy("lang_true", "lang_pred").agg(
            F.count(F.lit(1)).alias("n")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        with_vec.unpersist()
    return out


#: Gap threshold for 'und' on the holdout corpus: measured holdout
#: real-doc best-minus-runner-up gaps are >= 7.9e-4 and garbage-doc
#: gaps <= 7.5e-5 at sf0.01 (10x separation); 3e-4 sits log-centered
#: between the two populations.
LANG_UND_MARGIN = 3e-4
#: Letter-free filler for the injected 'und' rows (digit trigrams only,
#: so no class's orthography or markers can claim them).
LANG_GARBAGE = "31 41 59 26 53 58 97 93 23 84 "


def _lang_corpus_holdout(spark, sf_dir):
    """The held-out-evaluation corpus (VERDICT r7 #2): the marker
    corpus of :func:`_lang_corpus` plus (a) an EXACTLY-STRATIFIED
    deterministic split — train on ``doc_id % 5 != 4``, grade on the
    rest; modulo-on-modulo keeps the four classes exactly balanced in
    training, which matters because the one-vs-rest bias soaks up any
    class-prior imbalance and a ~1% skew (an md5-uniform split's
    typical deviation) is larger than the w.x decision margins — and
    (b) injected letter-free garbage rows (``lang_true='und'``, every
    third holdout doc) that the served model must route to 'und' via
    the confidence margin, never to a class."""
    docs = _read(spark, sf_dir, "documents")
    langs = F.array(*[F.lit(c) for c in LANG_CLASSES])
    marks = F.array(*[F.lit(LANG_MARKERS[c] + " ") for c in LANG_CLASSES])
    idx = (F.col("doc_id") % 4).cast("int") + 1
    reps = (F.lit(1) + F.expr(f"length(text) div {LANG_DENSITY}")).cast("int")
    is_und = (F.col("doc_id") % 5 == 4) & (F.col("doc_id") % 3 == 0)
    base = F.concat(
        F.repeat(F.element_at(marks, idx), reps), F.lower("text")
    )
    return docs.select(
        F.when(is_und, F.lit("und"))
        .otherwise(F.element_at(langs, idx))
        .alias("lang_true"),
        F.when(is_und, F.repeat(F.lit(LANG_GARBAGE), reps))
        .otherwise(base)
        .alias("t"),
        (F.col("doc_id") % 5 != 4).alias("is_train"),
    )


def q_language_id_holdout_confusion(spark, sf_dir):
    # GENERALIZATION grade for the trained language-id (VERDICT r7 #2
    # and #6): train on the stratified 80%, serve the UNSEEN 20% —
    # including injected letter-free garbage rows — with the
    # und_margin confidence gate, and grade the full confusion matrix
    # (diagonal for the four classes, 'und' for garbage). The
    # in-sample key (language_id_confusion) stays for continuity;
    # COVERAGE.md documents the in-sample-vs-holdout story, including
    # the measured class-imbalance sensitivity this key's exact
    # stratification neutralizes.
    corpus = _lang_corpus_holdout(spark, sf_dir)
    with_vec = X.hashed_char_ngrams(
        corpus, "t", dim=LANG_DIM, n=LANG_NGRAM, output_column="__cv__"
    ).persist()
    try:
        hist = X.language_train_logreg(
            with_vec.filter("is_train"), "t", "lang_true", LANG_CLASSES,
            dim=LANG_DIM, n=LANG_NGRAM, steps=LANG_STEPS, lr=1.0,
            vec_column="__cv__",
        )
        final = {
            r["class"]: (
                round(r["bias"], 6),
                [round(r[f"w{j}"], 6) for j in range(LANG_DIM)],
            )
            for r in hist.filter(F.col("step") == LANG_STEPS).collect()
        }
        served = X.language_id_trained(
            with_vec.filter("NOT is_train"), "t",
            {c: final[c] for c in LANG_CLASSES},
            dim=LANG_DIM, n=LANG_NGRAM, vec_column="__cv__",
            und_margin=LANG_UND_MARGIN,
        )
        out = served.groupBy("lang_true", "lang_pred").agg(
            F.count(F.lit(1)).alias("n")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        with_vec.unpersist()
    return out


def q_language_id_production_holdout(spark, sf_dir):
    # PRODUCTION-SHAPE holdout grade (r8 verdict #5): the same marker
    # corpus, stratified split, garbage injection and und-margin
    # contract as language_id_holdout_confusion, but at the shape a
    # user would deploy — dim=1024 hashed char-trigrams, 8 GD steps —
    # trained and served by the vectorized kernels
    # (language_train_logreg_vec / language_id_trained_vec: one
    # bounded partial-gradient row per Arrow batch, K*dim-row
    # exchange per step, X@W.T serving). A replay oracle would need
    # an 8-step x 4-class x 1024-dim GD unroll in SQL — infeasible —
    # so the oracle instead states the ACCURACY BAR independently:
    # the full holdout confusion matrix must be EXACTLY diagonal
    # (every real row correct, every garbage row routed to 'und' via
    # the margin). One misclassified holdout document anywhere makes
    # the key red. Measured margins back the bar: garbage gap
    # <= 2.0e-4, real gap >= 3.0e-3 at sf0.01 — margin 1e-3 sits
    # mid-gap, a decade from either side. The dim=32 Catalyst twin
    # stays fully GD-replay-graded; this key proves the SAME math at
    # production dims.
    import math

    corpus = _lang_corpus_holdout(spark, sf_dir)
    dim, steps, margin = 1024, 8, 1e-3
    # ONE cache for train scans + serving, PRUNED to the columns the
    # kernels need (label/split/gram-count/vector — the multi-KB text
    # would double cache memory for nothing), vectors cached as int32
    # (char-ngram counts; half the bytes of the kernel's long), and
    # partitioned by the VECTOR payload (~64 MB per partition), not
    # the source file count: at sf100 the 32-partition default put
    # ~1.2 GB of cached vectors in every task and execution memory
    # starved (measured UNABLE_TO_ACQUIRE_MEMORY). The partition
    # spread happens on the RAW TEXT (spread_to), so the one shuffle
    # moves ~5 GB of text, never the 20+ GB of derived vectors. The
    # trainer is told persist=False so it reuses this cache instead
    # of caching the same vectors twice.
    n_docs = _read(spark, sf_dir, "documents").count()
    parts = max(
        spark.sparkContext.defaultParallelism,
        math.ceil(n_docs * dim * 4 * 2 / (64 << 20)),
    )
    with_vec = X.hashed_char_ngrams(
        corpus, "t", dim=dim, n=LANG_NGRAM, output_column="__cv__",
        spread_to=parts,
    ).select(
        "lang_true",
        "is_train",
        F.greatest(F.length("t") - (LANG_NGRAM - 1), F.lit(1))
        .cast("double")
        .alias("__nt__"),
        F.col("__cv__").cast("array<int>").alias("__cv__"),
    ).persist()
    try:
        hist = X.language_train_logreg_vec(
            with_vec.filter("is_train"), None, "lang_true", LANG_CLASSES,
            dim=dim, n=LANG_NGRAM, steps=steps, lr=1.0,
            vec_column="__cv__", nt_column="__nt__", persist=False,
        )
        model = {
            r["class"]: (
                round(r["bias"], 8),
                [round(v, 8) for v in r["w"]],
            )
            for r in hist.filter(F.col("step") == steps).collect()
        }
        served = X.language_id_trained_vec(
            with_vec.filter("NOT is_train"), None,
            {c: model[c] for c in LANG_CLASSES},
            dim=dim, n=LANG_NGRAM, vec_column="__cv__",
            nt_column="__nt__", und_margin=margin,
        )
        out = served.groupBy("lang_true", "lang_pred").agg(
            F.count(F.lit(1)).alias("n")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        with_vec.unpersist()
    return out


def _lang_feature_sql() -> str:
    """Shared oracle prologue: the marker-injected corpus and the
    md5-hashed char-trigram features, replayed exactly (one md5 per
    gram, then one cheap list pass per slot)."""
    D = LANG_DIM
    lang_case = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(LANG_CLASSES)
    ) + " END"
    mark_case = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN '{LANG_MARKERS[c]} '"
        for i, c in enumerate(LANG_CLASSES)
    ) + " END"
    xs = ",\n             ".join(
        f"coalesce(list_sum(list_transform(hs, h -> CASE WHEN h % {D} = {j}"
        f" THEN 1 - 2 * ((h // {D}) % 2) ELSE 0 END)), 0) / nt AS x{j}"
        for j in range(D)
    )
    ys = ",\n             ".join(
        f"CAST(lang_true = '{c}' AS DOUBLE) AS y{i}"
        for i, c in enumerate(LANG_CLASSES)
    )
    return f"""
    WITH d AS (
      SELECT {lang_case} AS lang_true,
             repeat({mark_case},
                    1 + length(text) // {LANG_DENSITY}) || lower(text) AS t
      FROM documents
    ),
    g AS (
      SELECT lang_true,
             list_transform(range(1, greatest(length(t) - 1, 1)),
                 i -> ('0x' || substr(md5(substr(t, i, 3)), 1, 15))::BIGINT)
               AS hs,
             CAST(greatest(length(t) - 2, 1) AS DOUBLE) AS nt
      FROM d
    ),
    f AS (
      SELECT lang_true,
             {ys},
             {xs}
      FROM g
    ),
    w0 AS (SELECT """ + ", ".join(
        f"0.0 AS b{c}, " + ", ".join(f"0.0 AS w{c}_{j}" for j in range(D))
        for c in range(len(LANG_CLASSES))
    ) + ")"


def _lang_step_sql(steps: int) -> str:
    """GD step CTEs s{k}/w{k}, the quality_train_stats unroll shape
    generalized to K classes x D dims."""
    D, K = LANG_DIM, len(LANG_CLASSES)
    out = []
    xl = ", ".join(f"x{j}" for j in range(D))
    for k in range(1, steps + 1):
        p = k - 1
        zs = ",\n                     ".join(
            f"w.b{c} + " + " + ".join(
                f"w.w{c}_{j} * x{j}" for j in range(D)
            ) + f" AS z{c}"
            for c in range(K)
        )
        egs = ",\n               ".join(
            f"(0.5 * (1 + z{c} / (1 + abs(z{c}))) - y{c}) AS e{c},\n"
            f"               2 * (0.5 * (1 + z{c} / (1 + abs(z{c}))) - y{c})"
            f" * (0.5 / ((1 + abs(z{c})) * (1 + abs(z{c})))) AS g{c}"
            for c in range(K)
        )
        aggs = ",\n             ".join(
            f"avg(e{c} * e{c}) AS mse{c}, avg(g{c}) AS gb{c}, " + ", ".join(
                f"avg(g{c} * x{j}) AS g{c}_{j}" for j in range(D)
            )
            for c in range(K)
        )
        ws = ", ".join(
            f"w.b{c} - s.gb{c} AS b{c}, " + ", ".join(
                f"w.w{c}_{j} - s.g{c}_{j} AS w{c}_{j}" for j in range(D)
            )
            for c in range(K)
        )
        out.append(f""",
    s{k} AS (
      SELECT {aggs}
      FROM (
        SELECT {xl},
               {egs}
        FROM (SELECT f.*,
                     {zs}
              FROM f CROSS JOIN w{p} w) tz
      ) te
    ),
    w{k} AS (SELECT {ws} FROM w{p} w CROSS JOIN s{k} s)""")
    return "".join(out)


def _language_train_oracle_sql() -> str:
    D, K = LANG_DIM, len(LANG_CLASSES)
    selects = []
    for k in range(1, LANG_STEPS + 1):
        for c in range(K):
            cols = ", ".join(
                f"round(w{k}.w{c}_{j}, 6) AS w{j}" for j in range(D)
            )
            selects.append(
                f"""
    SELECT CAST({k} AS INTEGER) AS step, '{LANG_CLASSES[c]}' AS class,
           round(w{k}.b{c}, 6) AS bias, {cols},
           round(s{k}.mse{c}, 6) AS mse
    FROM w{k} CROSS JOIN s{k}"""
            )
    return (
        _lang_feature_sql()
        + _lang_step_sql(LANG_STEPS)
        + "\n    UNION ALL".join(selects)
    )


def _language_confusion_oracle_sql() -> str:
    D, K = LANG_DIM, len(LANG_CLASSES)
    S = LANG_STEPS
    wr = ", ".join(
        f"round(b{c}, 6) AS b{c}, " + ", ".join(
            f"round(w{c}_{j}, 6) AS w{c}_{j}" for j in range(D)
        )
        for c in range(K)
    )
    zs = ",\n             ".join(
        f"wr.b{c} + " + " + ".join(
            f"wr.w{c}_{j} * x{j}" for j in range(D)
        ) + f" AS z{c}"
        for c in range(K)
    )
    m = "greatest(" + ", ".join(f"z{c}" for c in range(K)) + ")"
    pred = "CASE " + " ".join(
        f"WHEN z{c} = {m} THEN '{LANG_CLASSES[c]}'" for c in range(K)
    ) + " END"
    return (
        _lang_feature_sql()
        + _lang_step_sql(S)
        + f""",
    wr AS (SELECT {wr} FROM w{S}),
    scored AS (
      SELECT lang_true,
             {zs}
      FROM f CROSS JOIN wr
    )
    SELECT lang_true, {pred} AS lang_pred,
           CAST(count(*) AS BIGINT) AS n
    FROM scored GROUP BY 1, 2"""
    )


def _language_holdout_oracle_sql() -> str:
    """Replay the FULL holdout pipeline in SQL: the stratified split,
    the garbage-row injection, GD over the training subset only, then
    margin-gated argmax scoring of the holdout subset (second-best via
    a sorted 4-list, exactly the serving fold's runner-up)."""
    D, K = LANG_DIM, len(LANG_CLASSES)
    S = LANG_STEPS
    lang_case = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(LANG_CLASSES)
    ) + " END"
    mark_case = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN '{LANG_MARKERS[c]} '"
        for i, c in enumerate(LANG_CLASSES)
    ) + " END"
    xs = ",\n             ".join(
        f"coalesce(list_sum(list_transform(hs, h -> CASE WHEN h % {D} = {j}"
        f" THEN 1 - 2 * ((h // {D}) % 2) ELSE 0 END)), 0) / nt AS x{j}"
        for j in range(D)
    )
    ys = ",\n             ".join(
        f"CAST(lang_true = '{c}' AS DOUBLE) AS y{i}"
        for i, c in enumerate(LANG_CLASSES)
    )
    w0 = ", ".join(
        f"0.0 AS b{c}, " + ", ".join(f"0.0 AS w{c}_{j}" for j in range(D))
        for c in range(K)
    )
    wr = ", ".join(
        f"round(b{c}, 6) AS b{c}, " + ", ".join(
            f"round(w{c}_{j}, 6) AS w{c}_{j}" for j in range(D)
        )
        for c in range(K)
    )
    zs = ",\n             ".join(
        f"wr.b{c} + " + " + ".join(
            f"wr.w{c}_{j} * x{j}" for j in range(D)
        ) + f" AS z{c}"
        for c in range(K)
    )
    zl = ", ".join(f"z{c}" for c in range(K))
    m = f"greatest({zl})"
    argmax = "CASE " + " ".join(
        f"WHEN z{c} = zb THEN '{LANG_CLASSES[c]}'" for c in range(K)
    ) + " END"
    prologue = f"""
    WITH d AS (
      SELECT CASE WHEN doc_id % 5 = 4 AND doc_id % 3 = 0 THEN 'und'
                  ELSE {lang_case} END AS lang_true,
             CASE WHEN doc_id % 5 = 4 AND doc_id % 3 = 0
                  THEN repeat('{LANG_GARBAGE}',
                              1 + length(text) // {LANG_DENSITY})
                  ELSE repeat({mark_case},
                              1 + length(text) // {LANG_DENSITY})
                       || lower(text) END AS t,
             (doc_id % 5 <> 4) AS is_train
      FROM documents
    ),
    g AS (
      SELECT lang_true, is_train,
             list_transform(range(1, greatest(length(t) - 1, 1)),
                 i -> ('0x' || substr(md5(substr(t, i, 3)), 1, 15))::BIGINT)
               AS hs,
             CAST(greatest(length(t) - 2, 1) AS DOUBLE) AS nt
      FROM d
    ),
    fall AS (
      SELECT lang_true, is_train,
             {ys},
             {xs}
      FROM g
    ),
    f AS (SELECT * FROM fall WHERE is_train),
    w0 AS (SELECT {w0})"""
    return (
        prologue
        + _lang_step_sql(S)
        + f""",
    wr AS (SELECT {wr} FROM w{S}),
    scored AS (
      SELECT lang_true,
             {zs}
      FROM fall CROSS JOIN wr
      WHERE NOT is_train
    ),
    ranked AS (
      SELECT lang_true, {zl}, {m} AS zb,
             list_sort([{zl}])[{K - 1}] AS z2nd
      FROM scored
    )
    SELECT lang_true,
           CASE WHEN zb - z2nd < {LANG_UND_MARGIN!r} THEN 'und'
                ELSE {argmax} END AS lang_pred,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked GROUP BY 1, 2"""
    )


def q_pipeline_compose(spark, sf_dir):
    # End-to-end training-data pipeline: quality filter -> exact dedup ->
    # token stats per language. Exactly SQL-reproducible.
    docs = _read(spark, sf_dir, "documents")
    scored = X.quality_score(docs, "text")
    good = scored.filter(F.col("quality") >= 0.99)
    deduped = D.dedup_exact(good, ["lang", "text"])
    tc = X.token_count(deduped, "text")
    return tc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


# --- pipeline signals, sampling, contamination, mixing, clustering ---------


def q_repetition_stats(spark, sf_dir):
    # Gopher-style duplicate-n-gram ratios per doc; pure Catalyst array
    # math, exact integer-ratio doubles, so SQL-reproducible.
    from ..utils import spread_rows  # heavy Catalyst chain: SCALE.md hazard 1
    docs = spread_rows(_read(spark, sf_dir, "documents"))
    r = P.ngram_repetition(docs, "text", ns=(2, 3))
    return r.groupBy("lang").agg(
        F.round(F.sum("dup2_ratio"), 4).alias("sum_dup2"),
        F.round(F.sum("dup3_ratio"), 4).alias("sum_dup3"),
        F.sum((F.col("dup2_ratio") > 0.1).cast("long")).alias("n_repetitive"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_pii_stats(spark, sf_dir):
    # regexp_count of emails / URLs / long digit runs, per source.
    from ..utils import spread_rows  # heavy Catalyst chain: SCALE.md hazard 1
    docs = spread_rows(_read(spark, sf_dir, "documents"))
    p = P.pii_stats(docs, "text")
    return p.groupBy("source").agg(
        F.sum("n_email").cast("long").alias("total_email"),
        F.sum("n_url").cast("long").alias("total_url"),
        F.sum("n_long_digits").cast("long").alias("total_long_digits"),
        F.count(F.lit(1)).alias("n_docs"),
    )


#: Per-language keep rates for the deterministic sampling query.
SAMPLE_RATES = {"en": 0.6, "fr": 0.3, "de": 0.3, "es": 0.45, "zh": 0.2}


def q_stratified_sample(spark, sf_dir):
    # Deterministic md5-uniform Bernoulli sampling per language stratum;
    # the keep decision is exactly reproducible in any engine with md5.
    docs = _read(spark, sf_dir, "documents")
    s = P.stratified_sample(docs, "lang", SAMPLE_RATES, "doc_id")
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def q_ngram_contamination(spark, sf_dir):
    # Train/test contamination: fraction of each corpus doc's distinct
    # 5-grams present in the (broadcast) benchmark gram set.
    from ..utils import spread_rows

    # Guarded row spread (round-10, same class as the r9 five): the
    # tokenize + gram-slice chain otherwise runs at file-split
    # parallelism — one task on the one-row-group .sf1/.sf10 files
    # (measured 33.6 s serialized at sf1).
    docs = spread_rows(
        _read(spark, sf_dir, "documents"),
        min_files=spark.sparkContext.defaultParallelism,
    )
    bench = docs.filter("doc_id % 97 = 0")
    corpus = docs.filter("doc_id % 97 != 0")
    c = P.ngram_contamination(corpus, bench, "text", "doc_id", n=5)
    return c.groupBy("lang").agg(
        F.sum((F.col("contamination") >= 0.5).cast("long")).alias(
            "n_contaminated"
        ),
        F.round(F.sum("contamination"), 4).alias("sum_contamination"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_length_bucket_stats(spark, sf_dir):
    # Pad-efficiency batching: docs bucketed by token length (fixed
    # integer edges), batched 8-at-a-time within (shard, bucket); per
    # bucket: docs, batches, total padding cost, max length.
    docs = _read(spark, sf_dir, "documents")
    tc = X.token_count(docs, "text")
    out = P.length_bucketed_batches(
        tc, "n_tokens", batch_size=8, shard_key="doc_id", n_shards=8
    )
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("shard", "batch_id").alias("n_batches"),
        F.sum("batch_pad").cast("long").alias("total_pad"),
        F.max(F.col("n_tokens").cast("long")).alias("max_len"),
    )


def q_bloom_contamination(spark, sf_dir):
    # Dolma-style Bloom decontamination: benchmark 3-grams hashed into a
    # 2^16-bit filter (k=3 md5-derived positions); corpus docs scored by
    # the fraction of grams with all 3 positions set. The small m makes
    # the filter dense enough that deterministic false positives occur —
    # the oracle replays the identical md5 arithmetic, so they match.
    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter("doc_id % 97 = 0")
    corpus = docs.filter("doc_id % 97 != 0")
    m, k = 1 << 16, 3
    bloom = P.bloom_filter_build(bench, "text", n=3, m_bits=m, k_hashes=k)
    c = P.bloom_contamination(
        corpus, bloom, "text", "doc_id", n=3, m_bits=m, k_hashes=k
    )
    return c.groupBy("lang").agg(
        F.sum((F.col("bloom_hit_fraction") >= 0.5).cast("long")).alias(
            "n_flagged"
        ),
        F.round(F.sum("bloom_hit_fraction"), 4).alias("sum_fraction"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_domain_mix_weights(spark, sf_dir):
    # Temperature-flattened mixing weights over sources (alpha = 0.7).
    docs = _read(spark, sf_dir, "documents")
    w = P.domain_mix_weights(docs, "source", "n_chars", alpha=0.7)
    return w.select(
        "source",
        "total_size",
        F.round("share", 6).alias("share_r"),
        F.round("weight", 6).alias("weight_r"),
    )


def q_tfidf_top_terms(spark, sf_dir):
    # Top-3 smoothed TF-IDF terms per document (corpus-wide stats,
    # output restricted to the first 100 docs). FP-robust ranking:
    # round(score, 6) + term tie-break, values emitted rounded.
    docs = _read(spark, sf_dir, "documents")
    top = X.tfidf_top_terms(docs, "text", "doc_id", k=3)
    return (
        top.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            "term",
            "tf",
            "df_t",
            F.round("score", 6).alias("score_r"),
            "rank",
        )
    )


def q_unigram_lm_stats(spark, sf_dir):
    # Corpus-unigram LM quality signal (CCNet-style): per-language doc
    # counts and average negative log-likelihood. Integer counts through
    # ln, per-doc rounding to 6 decimals replayed identically in SQL.
    docs = _read(spark, sf_dir, "documents")
    scored = X.unigram_logprob_score(docs, "text", "doc_id")
    return (
        scored.filter(F.col("lm_nll").isNotNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("lm_nll"), 4).alias("avg_nll"),
        )
    )


def q_bpe_merges(spark, sf_dir):
    # Distributed BPE vocab induction: the first 6 learned merges over
    # the documents corpus (word-histogram formulation — iterations
    # never touch the corpus). The oracle unrolls all 6 steps in SQL:
    # same pair counts, same (count DESC, left, right) argmax, same
    # greedy left-to-right merge application via non-overlapping
    # replace on a unit-separator representation.
    docs = _read(spark, sf_dir, "documents")
    return X.bpe_learn_merges(docs, "text", num_merges=6)


def _bpe_oracle_sql(num_merges: int = 6, mode: str = "merges") -> str:
    # Every CTE is MATERIALIZED: the chain w0 -> p1 -> m1 -> w1 -> ...
    # references each step several times (w{i} reads m{i} four times),
    # and DuckDB's default inlining would re-expand the whole prefix
    # exponentially.
    s = "chr(31)"
    orig = ", orig" if mode == "fertility" else ""
    ctes = [
        f"""w0 AS MATERIALIZED (
          SELECT {s} || array_to_string(string_split_regex(w, ''), {s})
                 || {s} AS w, n{', w AS orig' if mode == 'fertility' else ''}
          FROM (
            SELECT w, count(*) AS n FROM (
              SELECT unnest(list_filter(
                  string_split_regex(trim(lower(text)), '\\s+'),
                  x -> x <> '')) AS w
              FROM documents
            ) GROUP BY w
          )
        )"""
    ]
    for i in range(1, num_merges + 1):
        p = i - 1
        ctes.append(
            f"""p{i} AS MATERIALIZED (
          SELECT pr[1] AS l, pr[2] AS r, sum(n) AS cnt
          FROM (
            SELECT n, unnest(list_transform(range(1, len(sy)),
                             j -> [sy[j], sy[j+1]])) AS pr
            FROM (
              SELECT list_filter(string_split(w, {s}), x -> x <> '') AS sy, n
              FROM w{p}
            )
          ) GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""m{i} AS MATERIALIZED (
          SELECT l, r, cnt FROM p{i}
          ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
        )"""
        )
        if i < num_merges or mode in ("apply", "fertility"):
            ctes.append(
                f"""w{i} AS MATERIALIZED (
          SELECT replace(w,
                   {s} || (SELECT l FROM m{i}) || {s}
                       || (SELECT r FROM m{i}) || {s},
                   {s} || (SELECT l FROM m{i})
                       || (SELECT r FROM m{i}) || {s}) AS w, n{orig}
          FROM w{p}
        )"""
            )
    if mode == "fertility":
        # Per-language fertility: join the per-(lang, word) histogram to
        # the fully merged symbol count of each distinct word.
        ctes.append(
            f"""syms AS MATERIALIZED (
          SELECT orig, len(list_filter(string_split(w, {s}), x -> x <> ''))
                 AS n_sym
          FROM w{num_merges}
        )"""
        )
        ctes.append(
            """wl AS MATERIALIZED (
          SELECT lang, w, count(*) AS n FROM (
            SELECT lang, unnest(list_filter(
                string_split_regex(trim(lower(text)), '\\s+'),
                x -> x <> '')) AS w
            FROM documents
          ) GROUP BY lang, w
        )"""
        )
        selects = """SELECT wl.lang,
          CAST(sum(wl.n) AS BIGINT) AS n_words,
          CAST(sum(wl.n * s.n_sym) AS BIGINT) AS n_subwords,
          round(CAST(sum(wl.n * s.n_sym) AS DOUBLE)
                / CAST(sum(wl.n) AS DOUBLE), 6) AS fertility
        FROM wl JOIN syms s ON wl.w = s.orig
        GROUP BY wl.lang"""
    elif mode == "apply":
        # Corpus stats of the FULLY MERGED word table: total subword
        # tokens (word frequency x symbols per word) and vocab size.
        ctes.append(
            f"""syms AS MATERIALIZED (
          SELECT list_filter(string_split(w, {s}), x -> x <> '') AS sy, n
          FROM w{num_merges}
        )"""
        )
        selects = """SELECT
          (SELECT CAST(sum(n * len(sy)) AS BIGINT) FROM syms) AS n_tokens,
          (SELECT CAST(count(DISTINCT t) AS BIGINT)
           FROM (SELECT unnest(sy) AS t FROM syms)) AS n_types"""
    else:
        selects = "\n        UNION ALL ".join(
            f"""SELECT CAST({i} AS INTEGER) AS step, l AS "left", r AS "right",
               l || r AS merged, CAST(cnt AS BIGINT) AS pair_count
        FROM m{i}"""
            for i in range(1, num_merges + 1)
        )
    return "WITH " + ",\n        ".join(ctes) + "\n        " + selects


def q_bpe_tokenized_stats(spark, sf_dir):
    # The serving side: learn 6 merges, then TOKENIZE the corpus with
    # them (single Arrow pass, merge table closure-captured) and report
    # total subword tokens + vocab size. The oracle re-learns the same
    # merges in SQL and reads the stats off the fully merged word
    # histogram — equal only if the Spark tokenizer applies the learned
    # merges identically.
    docs = _read(spark, sf_dir, "documents")
    merges = X.bpe_learn_merges(docs, "text", num_merges=6)
    tok = X.bpe_apply(docs, "text", merges)
    ex = tok.select(F.explode("bpe_tokens").alias("t"))
    return ex.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("t").alias("n_types"),
    )


def q_gopher_flags(spark, sf_dir):
    # Full Gopher rule bundle (word count, mean word length, symbol
    # ratio, bullets/ellipses, alpha-word ratio, required stopwords):
    # per-lang pass counts per rule. Pure Catalyst; the oracle replays
    # every rule in SQL.
    from ..utils import spread_rows  # heavy Catalyst chain: SCALE.md hazard 1
    docs = spread_rows(_read(spark, sf_dir, "documents"))
    g = P.gopher_quality_flags(docs, "text")
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("g_word_count_ok").cast("long")).alias("n_wc_ok"),
        F.sum(F.col("g_mean_word_len_ok").cast("long")).alias("n_mwl_ok"),
        F.sum(F.col("g_symbol_ratio_ok").cast("long")).alias("n_sym_ok"),
        F.sum(F.col("g_alpha_ratio_ok").cast("long")).alias("n_alpha_ok"),
        F.sum(F.col("g_stopword_ok").cast("long")).alias("n_stop_ok"),
        F.sum(F.col("gopher_pass").cast("long")).alias("n_pass"),
    )


def q_hashed_vector_stats(spark, sf_dir):
    # Feature-hashing doc vectors (signed hashing trick, dim=32):
    # per-lang doc count, summed squared norms, and two fixed-slot
    # sums. Exercises every slot's signed accumulation; the oracle
    # rebuilds the vectors from exploded tokens in SQL.
    docs = _read(spark, sf_dir, "documents")
    v = X.hashed_doc_vectors(docs, "text", dim=32)
    sq = F.aggregate(
        "doc_vec", F.lit(0).cast("long"), lambda a, x: a + x * x
    )
    return v.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(sq).cast("long").alias("sum_sq_norm"),
        F.sum(F.element_at("doc_vec", 1)).cast("long").alias("sum_slot0"),
        F.sum(F.element_at("doc_vec", 32)).cast("long").alias("sum_slot31"),
    )


def q_dataset_card(spark, sf_dir):
    # The per-language "dataset card" block a corpus release ships:
    # docs, tokens, char-entropy, and bigram-repetition signals in one
    # pass over composed pure-Catalyst + Arrow operators.
    docs = _read(spark, sf_dir, "documents")
    e = X.char_entropy(docs, "text")
    r = P.ngram_repetition(e, "text", ns=(2,))
    tc = X.token_count(r, "text")
    return tc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        F.round(F.avg(F.round("char_entropy", 6)), 4).alias("avg_entropy"),
        F.round(F.sum("dup2_ratio"), 4).alias("sum_dup2"),
    )


def q_ngram_novelty(spark, sf_dir):
    # Novelty scoring: the fraction of each doc's distinct 3-grams
    # FIRST seen in that doc (smallest doc_id wins) — the marginal
    # contribution ranking used to order crawl snapshots for training.
    # groupBy(gram).min(doc_id) is partial-aggregatable (no window, no
    # skew pileup on boilerplate grams); one join back.
    docs = _read(spark, sf_dir, "documents")
    # bind tokens BEFORE the gram-slicing lambda (SCALE.md: slicing the
    # raw split expression re-tokenizes once per gram)
    toked = docs.select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
        ).alias("__tk__"),
    )
    tk = F.col("__tk__")
    grams = toked.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                # size >= 3 guard: Spark's sequence(1, 0) DESCENDS
                F.when(
                    F.size(tk) >= 3,
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - 2),
                        lambda i: F.array_join(F.slice(tk, i, 3), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            )
        ).alias("g"),
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        grams.join(first, "g")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").cast("long").alias("total_grams"),
        F.sum("n_novel").cast("long").alias("total_novel"),
        F.round(
            F.sum("n_novel") / F.sum("n_grams").cast("double"), 6
        ).alias("novelty_ratio"),
    )


def q_gopher_prep_pipeline(spark, sf_dir):
    # The modern standard prep path end to end: Gopher rule gate ->
    # exact dedup on (lang, text) -> per-language surviving token
    # totals. Chains the full rule bundle into the dedup stage; the
    # oracle replays gate + DISTINCT + token sums.
    # the synthetic corpus has no English stopword coverage and no
    # lines, so gate on the four data-bearing rules (word count, mean
    # word length, symbol ratio, alpha ratio) rather than the full
    # conjunction — the audit-per-rule columns exist precisely so a
    # pipeline can choose its gate
    docs = _read(spark, sf_dir, "documents")
    gated = P.gopher_quality_flags(docs, "text").filter(
        "g_word_count_ok AND g_mean_word_len_ok AND g_symbol_ratio_ok"
        " AND g_alpha_ratio_ok"
    )
    deduped = D.dedup_exact(gated, ["lang", "text"])
    tc = X.token_count(deduped, "text")
    return tc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
    )


def q_heaps_law_stats(spark, sf_dir):
    # Vocabulary-growth readout (Heaps' law): per lang, total tokens,
    # distinct types, and the type-token ratio — the corpus-health
    # number that collapses when boilerplate floods a crawl.
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_types"),
        F.round(
            F.countDistinct("tok") / F.count(F.lit(1)).cast("double"), 6
        ).alias("type_token_ratio"),
    )


def q_zipf_slope(spark, sf_dir):
    # Zipf readout: least-squares slope of ln(freq) on ln(rank) over
    # the corpus unigram distribution (natural corpora sit near -1;
    # spammy/repetitive ones flatten). Explicit normal-equation
    # arithmetic so DuckDB replays it without regr_slope.
    #
    # DISTRIBUTED RANK (r4 verdict #3): the old version ranked the full
    # vocabulary with an un-partitioned row_number — one task holding
    # every distinct token. The regression only consumes SUMS of
    # f(rank), and within a tied-frequency block the y value ln(c) is
    # constant while the ranks are a fixed contiguous range [s+1, s+m]
    # — so WHICH token gets WHICH rank inside the block cannot change
    # any sum. That lets the rank be generated from the frequency
    # HISTOGRAM instead of the token table:
    #   1. hist(c -> m): one more tiny agg over freq.
    #   2. offsets s via a window over DISTINCT FREQUENCIES only —
    #      bounded by sum(distinct c) <= N, i.e. O(sqrt(total_tokens))
    #      rows (~2M at 10^12 tokens), never O(vocabulary).
    #   3. explode each block into <=65536-rank chunks, hash-repartition
    #      the chunk rows, then explode ranks — so the hapax block
    #      (half the vocabulary at c=1) is generated across the
    #      cluster, not in one task.
    # The DuckDB oracle keeps the direct per-token ranking: identical
    # (rank, c) multiset, so identical sums.
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    hist = freq.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = hist.withColumn(
        "s", F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long")
    )
    CH = 1 << 16
    chunks = off.select(
        "c",
        "s",
        "m",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.col("m") - 1) / F.lit(CH)).cast("long"),
            )
        ).alias("ci"),
    ).repartition(F.col("c"), F.col("ci"))
    ranked = chunks.select(
        F.explode(
            F.sequence(
                F.col("s") + F.col("ci") * CH + 1,
                F.least(
                    F.col("s") + (F.col("ci") + 1) * CH,
                    F.col("s") + F.col("m"),
                ),
            )
        ).alias("r"),
        F.log(F.col("c").cast("double")).alias("y"),
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.col("y"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        agg["n"].cast("long").alias("n_types"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            4,
        ).alias("zipf_slope"),
    )


def q_doc_length_summary(spark, sf_dir):
    # numeric_summary applied to document lengths per language — the
    # distribution report a corpus release ships.
    from ..sources import numeric_summary

    docs = _read(spark, sf_dir, "documents")
    return numeric_summary(docs, "n_chars", group_columns=("lang",))


def q_event_anomaly_zscores(spark, sf_dir):
    # Monitoring readout: hourly event counts z-scored against each
    # type's own mean/std across hours; flags hours > 2 sigma. Two hash
    # aggregations + a broadcast-size join of per-type stats.
    ev = _events_ts(spark, sf_dir)
    hourly = (
        ev.withColumn("hour_id", F.expr("unix_micros(ts) DIV 3600000000"))
        .groupBy("event_type", "hour_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"),
        F.stddev_samp("n").alias("sd"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    z = hourly.join(F.broadcast(stats), "event_type").withColumn(
        "z", F.round((F.col("n") - F.col("mu")) / F.col("sd"), 4)
    )
    return z.groupBy("event_type").agg(
        F.max("n_hours").cast("long").alias("n_hours"),
        F.round(F.max(F.abs(F.col("z"))), 4).alias("max_abs_z"),
        F.sum((F.abs(F.col("z")) > 2.0).cast("long")).alias(
            "n_anomalous_hours"
        ),
    )


def q_winnow_contamination(spark, sf_dir):
    # MOSS-style contamination: corpus docs sharing >= 1 winnowing
    # fingerprint with the benchmark set (doc_id % 97 == 0) — catches
    # shared substrings of length >= k + w - 1 = 8 chars, the guarantee
    # exact-gram and bloom checks lack. Broadcastable benchmark side.
    docs = _read(spark, sf_dir, "documents")
    fp = X.winnow_fingerprints(docs, "text", k=5, window=4)
    bench = (
        fp.filter("doc_id % 97 = 0")
        .select(F.explode("fingerprints").alias("f"))
        .distinct()
    )
    corpus = fp.filter("doc_id % 97 != 0").select(
        "doc_id", "lang", F.explode("fingerprints").alias("f")
    )
    hit = (
        corpus.join(F.broadcast(bench), "f")
        .select("doc_id")
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    per = fp.filter("doc_id % 97 != 0").join(hit, "doc_id", "left")
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
        .cast("long")
        .alias("n_contaminated"),
    )


def q_winnow_fingerprint_stats(spark, sf_dir):
    # Winnowing (MOSS) fingerprints: char-5-gram md5 hashes, window-4
    # minima, distinct per doc. Per lang: docs, total fingerprints, and
    # docs sharing >= 1 fingerprint with another doc. The oracle
    # replays gram hashing + window minima with DuckDB list ops.
    docs = _read(spark, sf_dir, "documents")
    fp = X.winnow_fingerprints(docs, "text", k=5, window=4)
    ex = fp.select("doc_id", F.explode("fingerprints").alias("f"))
    byf = ex.groupBy("f").agg(F.count(F.lit(1)).alias("nd"))
    shared = (
        ex.join(byf.filter("nd >= 2"), "f")
        .select("doc_id")
        .distinct()
        .withColumn("__shared__", F.lit(1))
    )
    per = fp.join(shared, "doc_id", "left")
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("fingerprints")).cast("long").alias("sum_fps"),
        F.sum(F.coalesce(F.col("__shared__"), F.lit(0)))
        .cast("long")
        .alias("n_shared_docs"),
    )


def q_pii_redacted_stats(spark, sf_dir):
    # Typed-placeholder PII redaction (emails -> <PII:email> etc., pure
    # Catalyst regexp_replace chain); per-source changed-doc counts and
    # length deltas prove WHICH characters were replaced. The oracle
    # replays the identical RE2-compatible patterns with DuckDB's
    # regexp_replace(..., 'g').
    docs = _read(spark, sf_dir, "documents")
    red = P.pii_redact(docs, "text")
    return red.groupBy("source").agg(
        F.sum(
            (F.col("text_redacted") != F.col("text")).cast("long")
        ).alias("n_redacted"),
        F.sum(
            F.length("text_redacted") - F.length("text")
        ).cast("long").alias("len_delta"),
    )


def q_cluster_representative_stats(spark, sf_dir):
    # Near-dup collapse keeping the BEST doc per cluster (longest
    # n_chars, ties to smallest id) instead of the smallest id — the
    # survivor rule real dedup pipelines use. Components via the same
    # pair graph as dedup_clusters; singletons survive unconditionally.
    docs = _read(spark, sf_dir, "documents").filter("doc_id < 200")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.35)
    kept = P.cluster_representatives(docs, pairs, "doc_id", "n_chars")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


def q_dedup_clusters(spark, sf_dir):
    # Near-dup pair graph (3-gram Jaccard >= 0.35 on first 200 docs)
    # collapsed to connected components via min-label propagation.
    docs = _read(spark, sf_dir, "documents").filter("doc_id < 200")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.35)
    cc = P.connected_components(pairs, src="id_a", dst="id_b")
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )


# --- events (hypertable-style rollup, batch form) --------------------------


def q_event_hourly_rollup(spark, sf_dir):
    ev = _events_ts(spark, sf_dir)
    # floor(epoch_ns/3.6e12) == epoch_us DIV 3.6e9 for post-1970 data —
    # integer arithmetic the DuckDB oracle replays exactly.
    return (
        ev.withColumn(
            "hour_id", F.expr("unix_micros(ts) DIV 3600000000")
        )
        .groupBy("hour_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def _events_ts(spark, sf_dir):
    # Normalize events.ts to TimestampType whatever the parquet encoding
    # (BIGINT nanos under nanosAsLong, timestamp[us] as NTZ, or plain
    # TIMESTAMP) — utils.event_time handles all three.
    from ..utils import event_time

    ev = _read(spark, sf_dir, "events")
    return ev.withColumn("ts", event_time(ev, "ts"))


def q_sessionize_stats(spark, sf_dir):
    # Gap-based sessionization (30 min) per user, then corpus-level
    # session statistics. One shuffle for the session assignment (lag +
    # running sum share a window spec), one for the per-session agg.
    from . import temporal as T

    ev = _events_ts(spark, sf_dir).select("user_id", "ts")
    sess = T.sessionize(ev, "user_id", "ts", gap_seconds=1800.0)
    per = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "span_us"
        ),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.sum("n") / F.count(F.lit(1)), 6).alias("avg_events"),
        F.max("n").alias("max_events"),
        F.round(
            F.sum("span_us") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 3
        ).alias("avg_span_sec"),
    )


def q_asof_join_gap(spark, sf_dir):
    # As-of join: each purchase matched to the user's most recent prior
    # click (union + single window pass — no nested-loop join), then
    # exact integer-microsecond gap statistics.
    from . import temporal as T

    ev = _events_ts(spark, sf_dir)
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts")
    j = T.asof_join(purchases, clicks, "user_id", "ts", right_cols=[])
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r__asof"))
    return j.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("ts_r__asof").alias("n_matched"),
        F.round(
            F.sum(gap_us) / (F.count("ts_r__asof") * F.lit(1_000_000.0)), 6
        ).alias("avg_gap_sec"),
        F.round(F.max(gap_us) / F.lit(1_000_000.0), 6).alias("max_gap_sec"),
    )


def q_range_join_count(spark, sf_dir):
    # Bounded time-range join (errors within 1 day after a purchase by
    # the same user) via time-cell bucketing: theta-join re-expressed as
    # an equi-join on (user, cell) + exact range filter.
    from . import temporal as T

    ev = _events_ts(spark, sf_dir)
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "ts")
    errors = ev.filter("event_type = 'error'").select("user_id", "ts")
    j = T.time_range_join(
        purchases, errors, "user_id", "ts", "ts", 0.0, 86400.0
    )
    gap_us = F.unix_micros(F.col("ts_r")) - F.unix_micros(F.col("ts"))
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(gap_us) / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
        ).alias("avg_gap_sec"),
    )


def q_hll_user_rollup(spark, sf_dir):
    # Mergeable-sketch distinct counting (Spark 4 Datasketches HLL
    # built-ins): build per-(event_type, hour) user sketches ONCE, then
    # answer the per-(event_type, day) rollup by sketch UNION — no
    # second scan of the data. GRADE (made scale-invariant after the
    # round-9 sf1 sweep caught the old contract): the rollup estimate
    # must sit within the HLL error bound (5% ~= 3 sigma at the
    # default lgK=12) of the EXACT per-day distinct count, which the
    # oracle recomputes in SQL. At sf<=0.1 the sketches are sparse and
    # the estimate is exact (within_bound trivially true); at sf1+ the
    # cells cross into dense mode and this key is the proof the
    # estimates stay inside the sketch's published error — the exact
    # count travels in the output so the oracle hash still pins it.
    from ..sources.readers import build_distinct_sketches, rollup_distinct

    ev = _events_ts(spark, sf_dir)
    cells = ev.withColumn(
        "hour_id", F.expr("unix_micros(ts) DIV 3600000000")
    ).withColumn("day_id", F.expr("unix_micros(ts) DIV 86400000000"))
    sketches = build_distinct_sketches(
        cells, ["event_type", "day_id", "hour_id"], "user_id"
    )
    est = rollup_distinct(
        sketches, ["event_type", "day_id"], output_column="n_est"
    )
    exact = cells.groupBy("event_type", "day_id").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return est.join(exact, ["event_type", "day_id"]).select(
        "event_type",
        "day_id",
        F.col("n_users").cast("long").alias("n_users"),
        (
            F.abs(F.col("n_est") - F.col("n_users"))
            <= F.lit(0.05) * F.col("n_users")
        ).alias("within_bound"),
    )


def q_quantile_sketch_rollup(spark, sf_dir):
    # Mergeable QUANTILE sketches (histogram family — the deterministic
    # cousin of KLL/t-digest) completing the sketch set next to HLL
    # distinct: build per-(lang, source) bin-count arrays over n_chars
    # ONCE, then answer the per-lang median/p90 by element-wise
    # ADDITION of the arrays — no second scan. Answers are exact to
    # one bin width (2000/128 = 15.625 chars, binary-exact so the
    # float replay is bit-identical); the oracle replays the binning,
    # the merge, and the cumulative-rank quantile rule.
    from ..sources.readers import build_quantile_sketches, rollup_quantiles

    docs = _read(spark, sf_dir, "documents")
    sk = build_quantile_sketches(
        docs, ["lang", "source"], "n_chars", low=0.0, high=2000.0, bins=128
    )
    return rollup_quantiles(
        sk, ["lang"], qs=(0.5, 0.9), low=0.0, high=2000.0, bins=128
    )


ORACLE_QUANTILE_SKETCH = """
    WITH binned AS (
      SELECT lang,
             CAST(least(greatest(floor(CAST(n_chars AS DOUBLE) / 15.625),
                                 0), 127) AS INT) AS bin
      FROM documents WHERE n_chars IS NOT NULL
    ), hist AS (
      SELECT lang, bin, count(*) AS c FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT lang, bin, c,
             sum(c) OVER (PARTITION BY lang ORDER BY bin) AS cs,
             sum(c) OVER (PARTITION BY lang) AS n
      FROM hist
    )
    SELECT lang, CAST(max(n) AS BIGINT) AS n,
           0.0 + 15.625 * (min(CASE WHEN cs >= ceil(0.5 * n) THEN bin END)
                           + 1) AS q0_5,
           0.0 + 15.625 * (min(CASE WHEN cs >= ceil(0.9 * n) THEN bin END)
                           + 1) AS q0_9
    FROM cum GROUP BY lang
"""


def q_interval_overlap_count(spark, sf_dir):
    # Interval-overlap join (sessions x campaigns shape): view events
    # become [ts, ts+600s] intervals, purchase events [ts, ts+300s];
    # pairs of the same user whose intervals overlap, counted with the
    # summed overlap seconds. The cell decomposition attributes each
    # pair to the single cell containing greatest(start, start) — no
    # post-join dedup — and the oracle replays the raw theta-join.
    from . import temporal as T

    ev = _events_ts(spark, sf_dir)
    views = ev.filter("event_type = 'view'").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 600 SECONDS")).alias("e"),
    )
    buys = ev.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"),
    )
    j = T.interval_overlap_join(
        views, buys, "user_id", "s", "e", "s", "e", cell_seconds=600
    )
    ov_us = (
        F.least(F.unix_micros("e"), F.unix_micros("e_r"))
        - F.greatest(F.unix_micros("s"), F.unix_micros("s_r"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum(ov_us) / F.lit(1_000_000)).cast("long").alias("overlap_sec"),
    )


def q_pack_sequences_stats(spark, sf_dir):
    # GPT-style concat-then-chunk packing layout over the documents
    # table (seq_len 512, 8 independent shards), summarized: how many
    # training sequences, how many docs straddle a cut, and the fill
    # ratio of the packed batches.
    from . import pipeline as P
    from . import text as X

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = X.token_count(docs, "text")
    packed = P.pack_sequences(toks, "n_tokens", seq_len=512, n_shards=8)
    per_shard = packed.groupBy("shard").agg(
        F.ceil(
            F.max(F.col("start_offset") + F.col("n_tokens")) / F.lit(512)
        ).alias("n_seqs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("spans_boundary").cast("long")).alias("spanning"),
    )
    return per_shard.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_seqs").cast("long").alias("n_sequences"),
        F.sum("spanning").cast("long").alias("spanning_docs"),
        F.round(
            F.sum("shard_tokens") / (F.sum("n_seqs") * F.lit(512.0)), 6
        ).alias("fill_ratio"),
    )


def q_sliding_chunk_stats(spark, sf_dir):
    # Overlapping RAG-style chunk spans (window 32, stride 24) over the
    # documents table: chunk counts and coverage, all from integer span
    # math (no text materialized in the exploded rows).
    from . import pipeline as P
    from . import text as X

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = X.token_count(docs, "text").drop("text")
    chunks = P.sliding_chunks(toks, "n_tokens", window=32, stride=24)
    return chunks.agg(
        F.count_distinct("doc_id").alias("n_docs_chunked"),
        F.count(F.lit(1)).alias("total_chunks"),
        F.sum((F.col("chunk_len") == 32).cast("long")).alias("full_chunks"),
        F.round(F.avg("chunk_len"), 6).alias("avg_chunk_len"),
    )


def q_kmeans_cluster_stats(spark, sf_dir):
    # Deterministic Lloyd k-means (k=4, 3 fixed iterations, seeds = the
    # 4 smallest vec_ids) over the embeddings table; per-cluster size,
    # majority ground-truth label, and mean distance to centroid. The
    # oracle replays the identical iterations as unrolled DuckDB CTEs.
    from pyspark.sql import Window

    from . import clustering as C

    emb = _read(spark, sf_dir, "embeddings")
    # materialize=True: ``out`` feeds both the majority-label branch and
    # the stats branch — one assignment pass instead of two.
    out, _ = C.kmeans_fit_predict(emb, k=4, n_iter=3, materialize=True)
    per = out.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
    maj = (
        per.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("cluster", F.col("label").cast("long").alias("majority_label"))
    )
    stats = out.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("dist"), 3).alias("avg_dist"),
    )
    return stats.join(maj, "cluster").select(
        "cluster", "n_points", "majority_label", "avg_dist"
    )


def q_semantic_dedup_stats(spark, sf_dir):
    # SemDeDup: deterministic k-means (k=4, 2 iterations), then drop
    # rows with an in-cluster smaller-id cosine neighbor >= 0.9. The
    # synthetic embeddings are near-orthogonal (max pairwise cosine
    # ~0.51), so semantic duplicates are injected deterministically:
    # every vec_id % 5 == 0 row is re-added as vec_id + 100000 — an
    # exact copy that lands in the same cluster and MUST be dropped
    # (cosine 1.0 to its smaller-id twin). Oracle: shared k-means CTE
    # replay over the same unioned base + the EXISTS cosine predicate.
    from . import clustering as C

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    dups = emb.filter(F.col("vec_id") % 5 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(100000)
    )
    # method="lsh": the SCALE path (r4 verdict #2/#3 pattern, same as
    # cosine_dedup) — the oracle-replayable k=4 makes the exact
    # in-cluster pass O(n^2/4), measured 29x for 10x data at sf10;
    # LSH-bucketing within clusters (auto bits ceil(log2(n/128)),
    # deterministic Rademacher planes, round(cos, 6)) keeps bucket
    # occupancy constant so the pass is linear at any k. The injected
    # exact copies share every bucket by construction and MUST still
    # be dropped. The exact method remains the test-side cross-check
    # (tests/test_clustering.py::test_semantic_dedup_lsh_vs_exact).
    kept = C.semantic_dedup(
        emb.unionByName(dups), "embedding", "vec_id", k=4, n_iter=2,
        threshold=0.9, method="lsh", bits=None, plane_kind="rademacher",
        round_scores=True,
    )
    return kept.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("vec_id").cast("long").alias("min_kept_id"),
        F.max("vec_id").cast("long").alias("max_kept_id"),
    )


def q_streaming_hourly_rollup(spark, sf_dir):
    # The SAME hourly rollup as event_hourly_rollup, but executed as a
    # genuine Structured Streaming job: file-source readStream ->
    # watermark -> windowed agg -> memory sink, replayed to completion
    # with trigger(availableNow). Value-checked against the batch SQL
    # oracle — the point is that the declarative plan is identical in
    # both modes (Catalyst compiles it incrementally under readStream).
    import shutil
    import tempfile
    import uuid

    from ..streaming import events as SE

    tmp = tempfile.mkdtemp(prefix="tas_stream_")
    stage = os.path.join(tmp, "events")
    os.makedirs(stage)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stage, "part-000.parquet"),
    )
    name = f"tas_stream_rollup_{uuid.uuid4().hex[:8]}"
    stream = SE.read_event_stream(spark, stage)
    win = SE.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    from ..utils import stream_state_partitions

    # Aggregation state partitions sized to the staged file, not the
    # session's batch shuffle setting (bytes known free via stat).
    with stream_state_partitions(
        spark,
        input_bytes=os.path.getsize(os.path.join(stage, "part-000.parquet")),
    ):
        q = (
            win.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    # The memory sink holds the rows in the driver; the staged copy and
    # checkpoint are no longer needed.
    shutil.rmtree(tmp, ignore_errors=True)
    out = spark.table(name)
    return out.select(
        (F.unix_timestamp("window_start") / 3600).cast("long").alias("hour_id"),
        "event_type",
        F.col("n"),
        F.round("sum_value", 4).alias("sum_value"),
    )


def q_streaming_html_ingest(spark, sf_dir):
    # Crawl-ingest stage 0 AS A STREAM: file-source readStream over the
    # documents table -> in-query page synthesis (the html_extract_stats
    # template) -> html_extract -> token-count quality gate -> per-lang
    # aggregate, replayed to completion with trigger(availableNow) into
    # a memory sink. The extraction chain is stateless Catalyst, so the
    # incremental plan is the batch plan — which is the point: the same
    # stage-0 operators serve batch backfills and live ingest. Oracle:
    # the batch SQL equivalent (expected-text form).
    import shutil
    import tempfile
    import uuid

    tmp = tempfile.mkdtemp(prefix="tas_stream_html_")
    stage = os.path.join(tmp, "docs")
    os.makedirs(stage)
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(stage, "part-000.parquet"),
    )
    name = f"tas_stream_html_{uuid.uuid4().hex[:8]}"
    schema = _read(spark, sf_dir, "documents").schema
    # Round-8 found-and-fixed #4 (streaming face): the staged corpus is
    # ONE parquet file, so every micro-batch's extraction chain ran in
    # one task. Round-robin the raw rows across cores per micro-batch
    # (same cure as read_warc_stream's manifest spread).
    stream = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit(
            '<html><!-- nav & junk --><head><title>T</title>'
            '<script type="text/x">if (a<b && c>d) { f("&amp;"); }'
            "</script><style>p { c: r; }</style></head>"
            '<body id="b"><h1>Title &amp; Stats</h1><p>'
        ),
        esc,
        F.lit('</p><div class="foot">Copyright &copy; '),
        (F.lit(2000) + F.col("doc_id") % 30).cast("string"),
        F.lit(" &lt;Corp&gt;</div>5 &lt; 6<br/>end</body></html>"),
    )
    extracted = X.html_extract(
        stream.withColumn("html", page), "html", "t"
    )
    # Quality gate on the EXTRACTED text (the stage-0 contract: junk
    # markup must not count toward the token threshold). The gate is a
    # CONDITIONAL AGGREGATE, not a Filter node: a filter on the
    # derived nt gets predicate-pushed below the row-spread exchange,
    # where it re-inlines the whole extraction chain into the
    # single-task pre-shuffle stage (measured: 71 s vs 9 s at sf10 —
    # the round-8 #5 expression-duplication hazard, streaming face,
    # where persist() is not available).
    with_nt = X.token_count(extracted, "t", "nt")
    keep = F.col("nt") >= 50
    agg = with_nt.groupBy("lang").agg(
        F.sum(keep.cast("long")).alias("n_docs"),
        F.sum(
            F.when(keep, F.length("t")).otherwise(F.lit(0))
        ).alias("sum_extracted_chars"),
    )
    from ..utils import stream_state_partitions

    with stream_state_partitions(
        spark,
        input_bytes=os.path.getsize(os.path.join(stage, "part-000.parquet")),
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    shutil.rmtree(tmp, ignore_errors=True)
    # HAVING semantics: the conditional aggregate emits a (lang, 0, 0)
    # row for a language whose docs ALL fail the nt>=50 gate, but the
    # batch/oracle form (WHERE nt >= 50 ... GROUP BY lang) emits no
    # row for that language — drop zero-survivor groups so both sides
    # agree on any corpus, not just ones where every lang survives.
    return spark.table(name).filter(F.col("n_docs") > 0).select(
        "lang", "n_docs", "sum_extracted_chars"
    )


def q_streaming_interval_join(spark, sf_dir):
    # TRUE two-stream interval join (r4 verdict #9): even-id events
    # (impressions) and odd-id events (responses) arrive as two
    # separate file streams, each split into two time-ordered files
    # processed one per micro-batch (maxFilesPerTrigger=1 — so the
    # join genuinely matches rows ACROSS micro-batches out of the
    # symmetric-hash join state, not within one batch). Native
    # watermarked stream-stream join; pairs = same user, response
    # 0..600 s after the impression. The oracle replays the plain
    # range join in SQL; value-parity with the batch time_range_join
    # operator is additionally locked in tests/test_streaming.py.
    import shutil
    import tempfile
    import uuid

    import pyarrow.parquet as pq

    from ..streaming.events import EVENT_SCHEMA
    from ..streaming.joins import stream_time_range_join
    from ..utils import event_time, stream_state_partitions

    tmp = tempfile.mkdtemp(prefix="tas_stream_")
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts_field = src.column("ts")
    # time-ordered split: file 0 = first half by ts, file 1 = rest, so
    # the watermark after batch 0 can never mark batch-1 rows late.
    import pyarrow.compute as pc

    order = pc.sort_indices(src, sort_keys=[("ts", "ascending")])
    srt = src.take(order)
    half = srt.num_rows // 2
    for side in ("l", "r"):
        os.makedirs(os.path.join(tmp, side))
        pq.write_table(
            srt.slice(0, half), os.path.join(tmp, side, "p0.parquet")
        )
        pq.write_table(
            srt.slice(half), os.path.join(tmp, side, "p1.parquet")
        )

    def read_side(side):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(tmp, side))
        )

    ls = read_side("l").filter("event_id % 2 = 0")
    rs = read_side("r").filter("event_id % 2 = 1")
    ls = ls.withColumn("event_time", event_time(ls, "ts")).drop("ts")
    rs = rs.withColumn("event_time", event_time(rs, "ts")).drop("ts")
    joined = stream_time_range_join(
        ls.select("event_id", "user_id", "event_time"),
        rs.select("event_id", "user_id", "event_time"),
        "user_id",
        "event_time",
        "event_time",
        0.0,
        600.0,
        watermark="30 minutes",
    )
    name = f"tas_stream_ij_{uuid.uuid4().hex[:8]}"
    # State partitions sized to the per-trigger volume (one file =
    # half the sorted events per side), not the session's batch
    # shuffle setting — see utils.stream_state_partitions.
    with stream_state_partitions(spark, rows=half):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    shutil.rmtree(tmp, ignore_errors=True)
    out = spark.table(name)
    return out.select(
        F.col("event_id").alias("left_event"),
        F.col("event_id_r").alias("right_event"),
        (
            F.unix_micros("event_time_r") - F.unix_micros("event_time")
        ).alias("delta_us"),
    )


def q_dhash_dedup(spark, sf_dir):
    # Image near-dup dedup by exact dHash bucket: images whose 9x8
    # gradient grids agree collapse to the smallest doc_id. Payload
    # widths cycle mod 7 while the grid samples mod 9 columns, so
    # DIFFERENT source sizes can produce identical grids — real
    # perceptual collisions, not just byte-identical images.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .filter("doc_id < 400")
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_ppm(
                    9 + int(d) % 7, 8 + int(d) % 5, int(d) % 50
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_img = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    h = M.dhash_images(with_img, "payload")
    keep = h.groupBy("dhash").agg(F.min("doc_id").alias("doc_id"))
    kept = h.join(keep, ["dhash", "doc_id"])
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.countDistinct("dhash").alias("n_hashes"),
    )


def q_incremental_embedding_dedup(spark, sf_dir):
    # The embedding-side incremental-crawl contract: build the LSH
    # index on the corpus once, then dedup a new batch against it. The
    # batch is derived deterministically: exact copies of vec_id%7==0
    # corpus rows (MUST drop — same buckets, cosine 1) and negated
    # copies of vec_id%7==1 rows (cosine -1 — kept unless a genuine
    # bucket-mate clears the threshold, which the oracle replays too).
    emb = _read(spark, sf_dir, "embeddings").filter("vec_id < 2000")
    idx = S.build_lsh_index(
        emb, "embedding", "vec_id",
        bits=ANN_LSH_BITS, tables=ANN_LSH_TABLES, plane_kind="rademacher",
    )
    copies = emb.filter("vec_id % 7 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    negated = emb.filter("vec_id % 7 = 1").select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    batch = copies.unionByName(negated)
    kept = S.dedup_against_lsh_index(
        idx, batch, threshold=0.9, broadcast_batch=True
    )
    return kept.groupBy(
        F.when(F.col("vec_id") >= 200000, F.lit("negated"))
        .otherwise(F.lit("copy"))
        .alias("kind")
    ).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("vec_id").cast("long").alias("min_id"),
    )


def q_skew_report(spark, sf_dir):
    # Skew diagnostic on lineitem's supplier key: top-10 heaviest keys
    # with row shares — the pre-salting check. TakeOrdered, no global
    # sort.
    from ..utils import skew_report

    li = _read(spark, sf_dir, "lineitem")
    return skew_report(li, "l_suppkey", top_n=10)


def q_ab_test(spark, sf_dir):
    # Welch's t readout comparing click vs view event values in one
    # conditional-aggregate pass; SQL replays the identical arithmetic.
    from ..sources import ab_test_summary

    ev = _read(spark, sf_dir, "events")
    return ab_test_summary(ev, "event_type", "value", "click", "view")


def q_funnel_stats(spark, sf_dir):
    # Product-analytics funnel: signup -> purchase -> click, each step
    # strictly after the previous and within 7 days of the user's first
    # signup; distribution of steps completed. Oracle walks the same
    # strictly-sequential min-chain in SQL.
    from . import temporal as TP

    ev = _events_ts(spark, sf_dir)
    f = TP.funnel_conversion(
        ev, "user_id", "ts", "event_type",
        steps=("signup", "purchase", "click"),
        within_seconds=7 * 86400.0,
    )
    return f.groupBy("steps_completed").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def q_retention_cohorts(spark, sf_dir):
    # Weekly retention cohorts: users grouped by first-seen week,
    # distinct active users per (cohort, week offset). Two aggregations
    # and a join, no Python.
    from . import temporal as TP

    ev = _events_ts(spark, sf_dir)
    return TP.retention_cohorts(ev, "user_id", "ts")


def q_corr_matrix(spark, sf_dir):
    # Pairwise Pearson correlations of four lineitem measures in one
    # aggregation pass, long-format. Sample corr matches DuckDB's.
    from ..sources import correlation_matrix

    li = _read(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def q_numeric_summary(spark, sf_dir):
    # Per-group exact distribution summary (type-7 percentiles — the
    # same interpolation as DuckDB quantile_cont) in one pass.
    from ..sources import numeric_summary

    li = _read(spark, sf_dir, "lineitem")
    return numeric_summary(
        li, "l_quantity", group_columns=("l_returnflag",)
    )


def q_column_profile(spark, sf_dir):
    # One-pass data-quality profile of the orders table (null counts,
    # exact distincts, avg string-cast length per column) — the
    # ANALYZE/deequ-style report stored next to a table after ingest.
    # Integer/string columns only: float string-casts are not
    # engine-portable.
    from ..sources import profile_columns

    orders = _read(spark, sf_dir, "orders")
    return profile_columns(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


def q_char_entropy_stats(spark, sf_dir):
    # Character-entropy quality signal: per-lang doc counts and average
    # bits/char (rounded per doc so the float accumulation order the
    # kernel and the SQL oracle share survives the comparison).
    from ..utils import spread_rows  # heavy Catalyst chain: SCALE.md hazard 1
    docs = spread_rows(_read(spark, sf_dir, "documents"))
    e = X.char_entropy(docs, "text")
    return e.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.round("char_entropy", 6)), 4).alias("avg_entropy"),
        F.round(F.min(F.round("char_entropy", 6)), 4).alias("min_entropy"),
    )


def q_minhash_estimator_error(spark, sf_dir):
    # Self-evaluation of the MinHash estimator: for every band-colliding
    # pair (docs < 200), compare signature-agreement similarity against
    # the EXACT Jaccard over the same hashed-shingle universe. Reports
    # candidate count and avg estimate / exact / absolute error — the
    # numbers that justify the banded-LSH thresholds.
    docs = _read(spark, sf_dir, "documents").filter("doc_id < 200")
    sigs = D.minhash_signatures_md5(
        docs, "text", "doc_id", num_hashes=32, shingle_size=5
    )
    cand = D.minhash_lsh_candidates(
        sigs, "doc_id", bands=8, min_signature_similarity=0.0,
        num_hashes=32,
    )
    M = (1 << 31) - 1
    ex = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.length("text") - 4, F.lit(1))
                ),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.col("text").substr(i, F.lit(5))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long")
                % M,
            )
        ).alias("hm"),
    ).distinct()
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsz"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), F.col("a.hm") == F.col("b.hm"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    exact = (
        cand.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "nsz", "nsz_b"
            ),
            "id_b",
        )
        .withColumn(
            "exact_jac",
            F.coalesce(F.col("i"), F.lit(0)).cast("double")
            / (
                F.col("nsz") + F.col("nsz_b")
                - F.coalesce(F.col("i"), F.lit(0))
            ).cast("double"),
        )
    )
    return exact.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("signature_similarity"), 6).alias("avg_estimate"),
        F.round(F.avg("exact_jac"), 6).alias("avg_exact"),
        F.round(
            F.avg(F.abs(F.col("signature_similarity") - F.col("exact_jac"))),
            6,
        ).alias("avg_abs_error"),
    )


def q_bpe_fertility(spark, sf_dir):
    # Tokenizer fertility (subword tokens per word) per language under
    # the corpus-learned 6-merge BPE vocab — the metric tokenizer teams
    # track per language/domain. The oracle re-learns the merges in SQL
    # and joins per-(lang, word) counts to merged symbol counts — and
    # the Spark side now computes the SAME shape (r10 verdict #7 /
    # guide §8: decide on the small table): per-word subword counts
    # read off the learn phase's fully merged histogram (the merge
    # replace-chain IS the tokenizer, the bpe_tokenized_stats grade),
    # joined to one per-(lang, word) count pass. The old shape
    # re-encoded every document through the Python bpe_apply kernel
    # and tokenized the corpus a second time for n_words; both corpus
    # passes collapse into one JVM explode+groupBy. Fertility counts
    # are integer-exact in both shapes, so results are identical
    # (sum over docs of per-word counts == sum over words of
    # count x subwords; oracle parity green at sf0.001/0.01/0.1).
    docs = _read(spark, sf_dir, "documents")
    _, fused = X.bpe_learn_merges(
        docs, "text", num_merges=6, return_words=True
    )
    sep = "\x1f"
    syms = fused.select(
        F.col("__orig__").alias("__w__"),
        F.size(
            F.filter(F.split("__w__", sep), lambda s: s != F.lit(""))
        ).cast("long").alias("__nsym__"),
    )
    wl = (
        docs.select(
            "lang",
            F.explode(
                F.filter(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("__w__"),
        )
        .groupBy("lang", "__w__")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    j = wl.join(syms, "__w__")
    return j.groupBy("lang").agg(
        F.sum("__n__").alias("n_words"),
        F.sum(F.col("__n__") * F.col("__nsym__")).alias("n_subwords"),
        F.round(
            F.sum(F.col("__n__") * F.col("__nsym__")).cast("double")
            / F.sum("__n__").cast("double"),
            6,
        ).alias("fertility"),
    )


def q_soft_dedup_weights(spark, sf_dir):
    # Soft dedup: 1/|component| weights over the same near-dup pair
    # graph as dedup_clusters; singletons weigh 1.0. Per lang: docs,
    # docs downweighted, and the total effective (weighted) corpus
    # size. Oracle extends the recursive-CTE component replay.
    docs = _read(spark, sf_dir, "documents").filter("doc_id < 200")
    pairs = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.35
    )
    w = P.soft_dedup_weights(docs, pairs, "doc_id")
    return w.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("dedup_weight") < 1.0).cast("long")).alias(
            "n_downweighted"
        ),
        F.round(F.sum("dedup_weight"), 6).alias("effective_docs"),
    )


def q_recency_sample_stats(spark, sf_dir):
    # Freshness-decay sampling (half-life 14 days back from a fixed
    # logical date, 1% floor): per event_type kept counts + value sums.
    # Whole-second age math on both engines (Spark unix_timestamp
    # truncates; the oracle floors epoch()) so the md5-uniform
    # comparison never straddles a fractional-second rate difference.
    from ..utils import event_time

    ev = _read(spark, sf_dir, "events")
    ev = ev.withColumn("__et__", event_time(ev, "ts"))
    kept = P.recency_weighted_sample(
        ev,
        F.col("__et__"),
        "event_id",
        "2024-03-01 00:00:00",
        half_life_days=14.0,
        floor_rate=0.01,
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_chunk_vector_topk(spark, sf_dir):
    # The RAG indexing composition: sliding chunks -> per-chunk hashed
    # token vectors (unsigned: a non-empty chunk can't be the zero
    # vector) -> top-3 chunk retrieval for query docs THROUGH the IVF
    # index path (r4 verdict #2): build_ivf_index assigns every chunk
    # to its nearest deterministic centroid (the first chunk of every
    # doc with doc_id % M = 5, where M = 17 * ceil(sqrt(n_docs/500)) —
    # so the CELL COUNT GROWS ~sqrt(n) with the corpus, the FAISS IVF
    # sizing rule; a fixed nlist measured 53x for 10x data at sf10
    # because per-cell cost is O(n^2/nlist)), and query_ivf_index
    # probes the 4 nearest cells. Cost is |Q| * nprobe * |C| / nlist
    # instead of the old brute-force |Q| * |C| (45x at sf1 in SF1.md);
    # the oracle derives the same M from count(documents). The full
    # cell assignment, probe order, candidate set and FP-robust
    # ranking (round(cosine, 6), id tie-break) replay exactly in SQL;
    # brute_force_cosine_topk remains the test-side cross-check only
    # (tests/test_ann_index.py::test_chunk_ivf_vs_brute).
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda t: t != "",
        ).alias("tk"),
    ).withColumn("n_tokens", F.size("tk"))
    chunks = P.sliding_chunks(toked, "n_tokens", window=32, stride=24)
    chunks = chunks.select(
        (F.col("doc_id") * 100 + F.col("chunk_start") / 24)
        .cast("long")
        .alias("chunk_id"),
        F.col("doc_id"),
        F.array_join(
            F.slice(
                F.col("tk"),
                (F.col("chunk_start") + 1).cast("int"),
                F.col("chunk_len").cast("int"),
            ),
            " ",
        ).alias("chunk_text"),
    )
    cv = (
        X.hashed_doc_vectors(chunks, "chunk_text", dim=16, signed=False)
        .select(
            "chunk_id",
            "doc_id",
            F.col("doc_vec").cast("array<float>").alias("vec"),
        )
        # Vectorize the chunk corpus ONCE: the centroid collect, the
        # index build and the query slice all read this frame — without
        # the checkpoint each one re-runs the tokenize/chunk/vectorize
        # kernel chain over its own slice.
        .localCheckpoint(eager=True)
    )
    import math

    n_docs = docs.count()
    m = 17 * max(1, math.ceil(math.sqrt(n_docs / 500.0)))
    cents = [
        r["vec"]
        for r in cv.filter(f"chunk_id % 100 = 0 AND doc_id % {m} = 5")
        .orderBy("chunk_id")
        .select("vec", "chunk_id")
        .collect()
    ]
    idx = S.build_ivf_index(
        cv.select("chunk_id", "vec"), "vec", "chunk_id",
        nlist=len(cents), centroids=cents,
    )
    queries = cv.filter("doc_id % 97 = 0")
    allk = S.query_ivf_index(
        idx, queries.select("chunk_id", "vec"),
        k=3, nprobe=CHUNK_IVF_NPROBE, deterministic=True,
        include_rank=False,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


def q_mixed_media_pipeline(spark, sf_dir):
    # Composed text+image pipeline over a MIXED-format corpus: payloads
    # alternate PNG / GIF / BMP by doc_id % 3 (the dispatcher has to
    # route each), decode joins the Gopher text gate, and the rollup
    # counts docs passing both. Every branch's pixel sum replays in SQL.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = _read(spark, sf_dir, "documents")

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 3, 3 + d % 2
                if d % 3 == 0:
                    payloads.append(M.synthesize_png(w, h, d, color_type=2))
                elif d % 3 == 1:
                    payloads.append(M.synthesize_gif(w, h, d))
                else:
                    payloads.append(M.synthesize_bmp(w, h, d))
            pdf["payload"] = payloads
            yield pdf

    with_img = docs.select("doc_id", "lang", "text").mapInPandas(
        make,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("lang", T.StringType(), True),
                T.StructField("text", T.StringType(), True),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )
    dec = M.decode_image(with_img, "payload").drop("payload")
    g = P.gopher_quality_flags(dec, "text")
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("pixel_sum").isNotNull().cast("long")).alias(
            "n_decoded"
        ),
        F.sum("pixel_sum").cast("long").alias("sum_pixels"),
        F.sum(
            (F.col("gopher_pass") & (F.col("pixel_sum") > 1000)).cast(
                "long"
            )
        ).alias("n_pass_both"),
    )


def q_external_codec_decode(spark, sf_dir):
    # The codec seam exercised with a REAL third-party decoder (r4
    # verdict #6): register_pillow_codec() plugs Pillow into
    # decode_image's dispatcher ahead of the built-ins when the library
    # is importable, and returns False (registering nothing) when it
    # isn't — this container ships no imaging libs, so here the
    # registration no-ops and the built-ins decode. The payloads are
    # the three LOSSLESS formats (PNG/GIF/BMP by doc_id % 3), whose
    # decoded samples are byte-identical under either decoder, so the
    # oracle holds with and without Pillow installed — real-codec
    # TAKEOVER (WebP/interlaced-PNG formats the built-ins decline) is
    # asserted in tests/test_multimodal.py::TestPillowCodec, skipped
    # when the library is absent.
    from pyspark.sql import types as T

    from . import multimodal as M

    docs = _read(spark, sf_dir, "documents")

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 3, 3 + d % 2
                if d % 3 == 0:
                    payloads.append(M.synthesize_png(w, h, d, color_type=2))
                elif d % 3 == 1:
                    payloads.append(M.synthesize_gif(w, h, d))
                else:
                    payloads.append(M.synthesize_bmp(w, h, d))
            pdf["payload"] = payloads
            yield pdf

    with_img = docs.select("doc_id").mapInPandas(
        make,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )
    M.register_pillow_codec()
    try:
        # decode_image snapshots the codec registry at plan-build time,
        # so unregistering afterwards doesn't affect this query's run.
        dec = M.decode_image(with_img, "payload").drop("payload")
    finally:
        M.unregister_image_codec("pillow")
    return dec.groupBy((F.col("doc_id") % 3).cast("int").alias("fmt")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("pixel_sum").isNotNull().cast("long")).alias(
            "n_decoded"
        ),
        F.sum("pixel_sum").cast("long").alias("sum_pixels"),
        F.sum(F.col("height") * F.col("width") * F.col("channels"))
        .cast("long")
        .alias("sum_samples"),
    )


def q_rollup_counts(spark, sf_dir):
    # OLAP rollup over (lang, source): per-pair, per-lang subtotal, and
    # grand-total rows in ONE aggregation pass (Spark ROLLUP compiles to
    # a single Expand + aggregate — not three scans). DuckDB replays
    # with its own ROLLUP.
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            "n_docs",
            "sum_chars",
        )
    )


def q_cms_token_counts(spark, sf_dir):
    # Count-Min Sketch over corpus tokens (width 256 forces collisions,
    # so overestimates actually occur) vs exact counts per token. The
    # oracle replays counters, probes, and the min-of-rows estimate;
    # hash-matching proves the CMS guarantee (estimate >= exact) holds
    # with the exact same deterministic collisions.
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok")
    )
    sketch = P.cms_build(toks, "tok", width=256, depth=3)
    est = P.cms_estimate(
        sketch, toks.distinct(), "tok", width=256, depth=3
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    return est.join(exact, "tok").select(
        "tok",
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        F.col("exact_count").cast("long").alias("exact_count"),
    )


def q_zorder_stats(spark, sf_dir):
    # Morton (Z-order) key over (custkey % 256, order epoch-day % 256):
    # per top-4-bit Z-bucket row counts and key ranges — the layout a
    # lakehouse OPTIMIZE ZORDER produces, checked bit-exactly in SQL.
    from ..utils import zorder_key

    orders = _read(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey").cast("long"), F.lit(256))
    y = F.pmod(
        F.floor(
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
            / 86400
        ).cast("long"),
        F.lit(256),
    )
    z = zorder_key([x, y], bits=8)
    withz = orders.withColumn("zkey", z)
    return (
        withz.groupBy(F.shiftright(F.col("zkey"), 12).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zkey").alias("min_key"),
            F.max("zkey").alias("max_key"),
        )
    )


def q_resize_image_stats(spark, sf_dir):
    # Nearest-neighbor resize of synthesized PPMs to a fixed 6x4 grid:
    # every output byte is src[(y*h)//4, (x*w)//6, c] with the shared
    # (seed*7 + i*13) % 256 pixel formula — replayed byte-exactly in
    # SQL, including the re-encoded thumbnail's pixel sum.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id < 300")
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_ppm(
                    10 + int(d) % 14, 9 + int(d) % 10, int(d)
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_img = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    out = M.resize_images(with_img, "payload", 6, 4)
    return out.select(
        "doc_id", "resized_height", "resized_width", "resized_pixel_sum"
    )


def q_dhash_stats(spark, sf_dir):
    # Perceptual dHash over synthesized PPM images: 9x8 nearest-neighbor
    # gray grid, one bit per horizontal gradient, packed to 64 bits.
    # Pure integer math, replayed bit-exactly in SQL.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id < 300")
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_ppm(
                    10 + int(d) % 14, 9 + int(d) % 10, int(d)
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_img = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    return M.dhash_images(with_img, "payload").select("doc_id", "dhash")


def q_bigram_lm_stats(spark, sf_dir):
    # Interpolated bigram LM (corpus as its own model, lambda = 0.7):
    # per-language doc counts and average NLL. The oracle rebuilds
    # unigram/bigram tables and replays the identical double
    # arithmetic; docs with < 2 tokens are unscored.
    docs = _read(spark, sf_dir, "documents")
    scored = X.bigram_logprob_score(docs, "text", "doc_id", interp=0.7)
    return (
        scored.filter(F.col("lm2_nll").isNotNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("lm2_nll"), 4).alias("avg_nll2"),
        )
    )


def q_url_canon_stats(spark, sf_dir):
    # URL canonicalization + URL-level dedup: URLs synthesized per doc
    # with scheme / www / utm / trailing-slash / fragment variants and
    # intentional path collisions (doc_id % 50); per registered domain:
    # raw URLs vs distinct canonical URLs. Oracle replays the exact
    # normalization chain in DuckDB regex syntax.
    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(
            F.lit("http://")
        ),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("pages."),
        F.col("source"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".com")).otherwise(
            F.lit(".org")
        ),
        F.lit("/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("/")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("?utm_source=x&id="),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(
            F.lit("")
        ),
    )
    withu = docs.withColumn("url", url)
    c = X.canonicalize_urls(withu, "url")
    return c.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url_canon").alias("n_canonical"),
        F.countDistinct("host").alias("n_hosts"),
    )


def q_event_props_stats(spark, sf_dir):
    # Typed extraction from the JSON `props` payload (get_json_object ->
    # cast): per event_type, count + sum/max of the extracted field and
    # how many rows lacked it. DuckDB replays with json_extract_string.
    from ..functions.semistructured import extract_json_fields

    ev = _read(spark, sf_dir, "events")
    out = extract_json_fields(ev, "props", {"k": ("$.k", "long")})
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum(F.col("k").isNull().cast("long")).alias("n_missing"),
    )


def q_streaming_enriched_rollup(spark, sf_dir):
    # Stream-static enrichment: readStream events joined to the static
    # customer dimension (broadcast) per micro-batch, rolled up per
    # (market segment, event type). A genuine Structured Streaming run
    # (availableNow -> memory sink); the oracle is the plain batch join.
    import shutil
    import tempfile
    import uuid

    from ..streaming import events as SE

    tmp = tempfile.mkdtemp(prefix="tas_stream_enrich_")
    stage = os.path.join(tmp, "events")
    os.makedirs(stage)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stage, "part-000.parquet"),
    )
    name = f"tas_stream_enrich_{uuid.uuid4().hex[:8]}"
    stream = SE.read_event_stream(spark, stage)
    customer = _read(spark, sf_dir, "customer")
    out = SE.enriched_segment_rollup(stream, customer)
    from ..utils import stream_state_partitions

    with stream_state_partitions(
        spark,
        input_bytes=os.path.getsize(os.path.join(stage, "part-000.parquet")),
    ):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


ORACLES_STREAM_ENRICH = """
    SELECT c.c_mktsegment, e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 4) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
"""


# --- generated oracle SQL (shares constants with the Spark operators) ------


def _simhash_oracle_sql(bits: int = D.SIMHASH_BITS) -> str:
    accs = ",\n                 ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS a{j}"
        for j in range(bits)
    )
    terms = "\n               + ".join(
        f"(CASE WHEN a{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                        x -> x <> '')) AS tok
          FROM documents
        ), hs AS (
          SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
          FROM toks
        ), acc AS (
          SELECT doc_id,
                 {accs}
          FROM hs GROUP BY doc_id
        ), fp AS (
          SELECT doc_id,
               CAST({terms} AS BIGINT) AS simhash
          FROM acc
        ), alldocs AS (
          SELECT d.doc_id, coalesce(f.simhash, 0) AS simhash
          FROM documents d LEFT JOIN fp f USING (doc_id)
        )
        SELECT (simhash >> {bits - 8}) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM alldocs GROUP BY 1
    """


def _incr_emb_dedup_oracle_sql(
    bits: int = None, tables: int = None, dim: int = 64
) -> str:
    from .similarity import _LCG_A, _LCG_C, _LCG_M

    bits = ANN_LSH_BITS if bits is None else bits
    tables = ANN_LSH_TABLES if tables is None else tables
    half = _LCG_M // 2
    return f"""
        WITH corpus AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id < 2000
        ), batch AS (
          SELECT vec_id + 100000 AS vec_id, e FROM corpus
          WHERE vec_id % 7 = 0
          UNION ALL
          SELECT vec_id + 200000, list_transform(e, x -> -x) FROM corpus
          WHERE vec_id % 7 = 1
        ), allv AS (
          SELECT * FROM corpus UNION ALL SELECT * FROM batch
        ), grid AS (
          SELECT t.t, b.b, d.d,
                 CASE WHEN (((({_LCG_A} * (t.t * 100003 + b.b * 641
                               + (d.d - 1)) + {_LCG_C}) % {_LCG_M})
                             * (({_LCG_A} * (t.t * 100003 + b.b * 641
                               + (d.d - 1)) + {_LCG_C}) % {_LCG_M}))
                            // 32768) % {_LCG_M} >= {half}
                      THEN 1 ELSE -1 END AS sgn
          FROM (SELECT unnest(generate_series(0, {tables - 1})) AS t) t,
               (SELECT unnest(generate_series(0, {bits - 1})) AS b) b,
               (SELECT unnest(generate_series(1, {dim})) AS d) d
        ), dots AS (
          SELECT v.vec_id, g.t, g.b, sum(v.e[g.d] * g.sgn) AS dot
          FROM allv v, grid g GROUP BY 1, 2, 3
        ), buckets AS (
          SELECT vec_id, t,
                 sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << b
                          ELSE 0 END) AS bkt
          FROM dots GROUP BY 1, 2
        ), matched AS (
          SELECT DISTINCT nb.vec_id
          FROM buckets nb
          JOIN buckets ib ON nb.t = ib.t AND nb.bkt = ib.bkt
           AND ib.vec_id < 2000 AND nb.vec_id >= 100000
          JOIN allv q ON q.vec_id = nb.vec_id
          JOIN allv c ON c.vec_id = ib.vec_id
          WHERE list_cosine_similarity(q.e, c.e) >= 0.9
        ), kept AS (
          SELECT vec_id FROM batch
          WHERE vec_id NOT IN (SELECT vec_id FROM matched)
        )
        SELECT CASE WHEN vec_id >= 200000 THEN 'negated'
                    ELSE 'copy' END AS kind,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(min(vec_id) AS BIGINT) AS min_id
        FROM kept GROUP BY 1
    """


def _cosine_dedup_oracle_sql(
    threshold: float = 0.97, tables: int = 3, dim: int = 64, target: int = 128
) -> str:
    """Replays the LSH-bucketed cosine dedup end-to-end: the auto bucket
    width greatest(4, least(24, ceil(log2(n/target)))) from count(*),
    the LCG Rademacher planes (same formula as the ann_lsh oracle),
    same-bucket candidate pairs in any table, and the rounded-cosine
    threshold drop of the larger id."""
    from .similarity import _LCG_A, _LCG_C, _LCG_M

    half = _LCG_M // 2
    return f"""
        WITH nb AS (
          SELECT greatest(4, least(24,
                 CAST(ceil(log2(count(*) / {float(target)})) AS INT))) AS bits
          FROM embeddings
        ), grid AS (
          SELECT t.t, b.b, d.d,
                 CASE WHEN (((({_LCG_A} * (t.t * 100003 + b.b * 641
                               + (d.d - 1)) + {_LCG_C}) % {_LCG_M})
                             * (({_LCG_A} * (t.t * 100003 + b.b * 641
                               + (d.d - 1)) + {_LCG_C}) % {_LCG_M}))
                            // 32768) % {_LCG_M} >= {half}
                      THEN 1 ELSE -1 END AS sgn
          FROM (SELECT unnest(generate_series(0, {tables - 1})) AS t) t,
               (SELECT unnest(generate_series(0,
                      (SELECT bits FROM nb) - 1)) AS b) b,
               (SELECT unnest(generate_series(1, {dim})) AS d) d
        ), dots AS (
          SELECT e.vec_id, g.t, g.b,
                 sum(CAST(e.embedding[g.d] AS DOUBLE) * g.sgn) AS dot
          FROM embeddings e, grid g
          GROUP BY 1, 2, 3
        ), buckets AS (
          SELECT vec_id, t,
                 sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << b
                          ELSE 0 END) AS bkt
          FROM dots GROUP BY 1, 2
        ), dropped AS (
          SELECT DISTINCT c.vec_id AS id_b
          FROM buckets a JOIN buckets c
            ON a.t = c.t AND a.bkt = c.bkt AND a.vec_id < c.vec_id
          JOIN embeddings q ON q.vec_id = a.vec_id
          JOIN embeddings n ON n.vec_id = c.vec_id
          WHERE round(list_cosine_similarity(
                    CAST(q.embedding AS DOUBLE[]),
                    CAST(n.embedding AS DOUBLE[])), 6) >= {threshold}
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n_kept
        FROM embeddings e LEFT JOIN dropped d ON d.id_b = e.vec_id
        WHERE d.id_b IS NULL
        GROUP BY label
    """


def _ann_lsh_oracle_sql(
    bits: int = ANN_LSH_BITS,
    tables: int = ANN_LSH_TABLES,
    dim: int = 64,
    query_cap=None,
) -> str:
    from .similarity import _LCG_A, _LCG_C, _LCG_M

    half = _LCG_M // 2
    cap_pred = f" AND a.vec_id < {query_cap}" if query_cap else ""
    return f"""
        WITH emb AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id < 2000
        ), grid AS (
          SELECT t.t, b.b, d.d,
                 CASE WHEN (((({_LCG_A} * (t.t * 100003 + b.b * 641
                               + (d.d - 1)) + {_LCG_C}) % {_LCG_M})
                             * (({_LCG_A} * (t.t * 100003 + b.b * 641
                               + (d.d - 1)) + {_LCG_C}) % {_LCG_M}))
                            // 32768) % {_LCG_M} >= {half}
                      THEN 1 ELSE -1 END AS sgn
          FROM (SELECT unnest(generate_series(0, {tables - 1})) AS t) t,
               (SELECT unnest(generate_series(0, {bits - 1})) AS b) b,
               (SELECT unnest(generate_series(1, {dim})) AS d) d
        ), dots AS (
          SELECT e.vec_id, g.t, g.b,
                 sum(CAST(e.embedding[g.d] AS DOUBLE) * g.sgn) AS dot
          FROM emb e, grid g
          GROUP BY 1, 2, 3
        ), buckets AS (
          SELECT vec_id, t,
                 sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << b
                          ELSE 0 END) AS bkt
          FROM dots GROUP BY 1, 2
        ), bucketcand AS (
          SELECT a.vec_id AS qid, c.vec_id AS nid, a.t, a.bkt,
                 round(list_cosine_similarity(
                     CAST(q.embedding AS DOUBLE[]),
                     CAST(n.embedding AS DOUBLE[])), 6) AS cs
          FROM buckets a JOIN buckets c
            ON a.t = c.t AND a.bkt = c.bkt AND a.vec_id <> c.vec_id{cap_pred}
          JOIN emb q ON q.vec_id = a.vec_id
          JOIN emb n ON n.vec_id = c.vec_id
        ), percell AS (
          SELECT qid, nid, cs,
                 row_number() OVER (PARTITION BY qid, t, bkt
                                    ORDER BY cs DESC, nid) AS rn
          FROM bucketcand
        ), scored AS (
          SELECT DISTINCT qid, nid, cs FROM percell WHERE rn <= 3
        )
        SELECT qid AS query_id, nid AS neighbor_id,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (
          SELECT qid, nid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cs DESC, nid) AS rnk
          FROM scored)
        WHERE rnk <= 3
    """


def _ann_ivf_oracle_sql(
    nlist: int = ANN_IVF_NLIST,
    nprobe: int = ANN_IVF_NPROBE,
    auto_nlist: bool = False,
    query_cap=None,
) -> str:
    # auto_nlist replays the index queries' max(16, ceil(sqrt(n)))
    # cell-count scaling; query_cap restricts the PROBE (query) side to
    # the fixed batch the index queries use (assignment still covers the
    # whole corpus — it is the index).
    nlist_expr = (
        f"(SELECT greatest({ANN_IVF_NLIST}, CAST(ceil(sqrt(count(*)))"
        " AS BIGINT)) FROM embeddings)"
        if auto_nlist
        else str(nlist)
    )
    cap_pred = f" AND vec_id < {query_cap}" if query_cap else ""
    return f"""
        WITH cents AS (
          SELECT vec_id AS cid, embedding AS cemb
          FROM embeddings WHERE vec_id < {nlist_expr}
        ), sim AS (
          SELECT e.vec_id, c.cid,
                 round(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]),
                     CAST(c.cemb AS DOUBLE[])), 6) AS cs
          FROM embeddings e, cents c
        ), ranked_cells AS (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cs DESC, cid) AS rn
          FROM sim
        ), assign AS (
          SELECT vec_id, cid FROM ranked_cells WHERE rn = 1
        ), probes AS (
          SELECT vec_id, cid FROM ranked_cells
          WHERE rn <= {nprobe}{cap_pred}
        ), cellcand AS (
          SELECT p.vec_id AS qid, a.vec_id AS nid, p.cid,
                 round(list_cosine_similarity(
                     CAST(q.embedding AS DOUBLE[]),
                     CAST(n.embedding AS DOUBLE[])), 6) AS cs
          FROM probes p JOIN assign a
            ON a.cid = p.cid AND a.vec_id <> p.vec_id
          JOIN embeddings q ON q.vec_id = p.vec_id
          JOIN embeddings n ON n.vec_id = a.vec_id
        ), percell AS (
          SELECT qid, nid, cs,
                 row_number() OVER (PARTITION BY qid, cid
                                    ORDER BY cs DESC, nid) AS rn
          FROM cellcand
        ), scored AS (
          SELECT DISTINCT qid, nid, cs FROM percell WHERE rn <= 3
        )
        SELECT qid AS query_id, nid AS neighbor_id,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (
          SELECT qid, nid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cs DESC, nid) AS rnk
          FROM scored)
        WHERE rnk <= 3
    """


def _ann_ivfpq_oracle_sql(
    nlist: int = ANN_IVF_NLIST,
    nprobe: int = ANN_IVF_NPROBE,
    m: int = ANN_PQ_M,
    ksz: int = ANN_PQ_KSZ,
    dim: int = 64,
    auto_nlist: bool = False,
    query_cap=None,
    rerank=None,
) -> str:
    # Replays the full IVF-PQ pipeline: coarse cell assignment (identical
    # to the IVF oracle), per-subspace argmin-L2 codes on the rounded
    # surrogate ||cb||^2 - 2 v.cb (the row norm term is constant per
    # argmin), and ADC scoring as the sum of m per-(query, subspace)
    # lookup values. All dots are raw-slice inner products divided by
    # full-vector norms, so no normalized arrays need materializing.
    sub = dim // m
    if rerank is None:
        tail = """, percell AS (
          SELECT qid, nid, cs,
                 row_number() OVER (PARTITION BY qid, cid
                                    ORDER BY cs DESC, nid) AS rn
          FROM adc
        ), scored AS (
          SELECT DISTINCT qid, nid, cs FROM percell WHERE rn <= 3
        )
        SELECT qid AS query_id, nid AS neighbor_id,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (
          SELECT qid, nid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cs DESC, nid) AS rnk
          FROM scored)
        WHERE rnk <= 3"""
    else:
        # exact refinement: ADC picks a global top-`rerank` shortlist
        # per query (rounded score, id tie-break), then the TRUE
        # cosine re-ranks shortlist rows only — the FAISS IndexRefine
        # shape the Spark rerank path mirrors.
        tail = f""", shortlist AS (
          SELECT qid, nid FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cs DESC, nid) AS rn
            FROM adc) WHERE rn <= {rerank}
        ), exact AS (
          SELECT s.qid, s.nid,
                 round(list_cosine_similarity(
                     CAST(eq.embedding AS DOUBLE[]),
                     CAST(ec.embedding AS DOUBLE[])), 6) AS cs
          FROM shortlist s
          JOIN embeddings eq ON eq.vec_id = s.qid
          JOIN embeddings ec ON ec.vec_id = s.nid
        )
        SELECT qid AS query_id, nid AS neighbor_id,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (
          SELECT qid, nid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cs DESC, nid) AS rnk
          FROM exact)
        WHERE rnk <= 3"""
    nlist_expr = (
        f"(SELECT greatest({ANN_IVF_NLIST}, CAST(ceil(sqrt(count(*)))"
        " AS BIGINT)) FROM embeddings)"
        if auto_nlist
        else str(nlist)
    )
    cap_pred = f" AND vec_id < {query_cap}" if query_cap else ""
    return f"""
        WITH cents AS (
          SELECT vec_id AS cid, embedding AS cemb
          FROM embeddings WHERE vec_id < {nlist_expr}
        ), sim AS (
          SELECT e.vec_id, c.cid,
                 round(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]),
                     CAST(c.cemb AS DOUBLE[])), 6) AS cs
          FROM embeddings e, cents c
        ), ranked_cells AS (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cs DESC, cid) AS rn
          FROM sim
        ), assign AS (
          SELECT vec_id, cid FROM ranked_cells WHERE rn = 1
        ), probes AS (
          SELECT vec_id, cid FROM ranked_cells
          WHERE rn <= {nprobe}{cap_pred}
        ), cb AS (
          SELECT j.j, e.vec_id AS c,
                 list_slice(CAST(e.embedding AS DOUBLE[]),
                            j.j * {sub} + 1, j.j * {sub} + {sub}) AS raw,
                 sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[]))) AS vn
          FROM (SELECT unnest(generate_series(0, {m - 1})) AS j) j,
               embeddings e
          WHERE e.vec_id < {ksz}
        ), rowslices AS (
          SELECT e.vec_id, j.j,
                 list_slice(CAST(e.embedding AS DOUBLE[]),
                            j.j * {sub} + 1, j.j * {sub} + {sub}) AS sl,
                 sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[]))) AS vn
          FROM embeddings e,
               (SELECT unnest(generate_series(0, {m - 1})) AS j) j
        ), codedist AS (
          SELECT r.vec_id, r.j, b.c,
                 round(list_inner_product(b.raw, b.raw) / (b.vn * b.vn)
                       - 2 * list_inner_product(r.sl, b.raw)
                           / (r.vn * b.vn), 6) AS d
          FROM rowslices r JOIN cb b ON b.j = r.j
        ), codes AS (
          SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY d, c) AS rn
            FROM codedist) WHERE rn = 1
        ), lut AS (
          SELECT r.vec_id AS qid, r.j, b.c,
                 list_inner_product(r.sl, b.raw) / (r.vn * b.vn) AS v
          FROM rowslices r JOIN cb b ON b.j = r.j
        ), adc AS (
          SELECT p.vec_id AS qid, a.vec_id AS nid, p.cid,
                 round(sum(l.v), 6) AS cs
          FROM probes p
          JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.vec_id
          JOIN codes cd ON cd.vec_id = a.vec_id
          JOIN lut l ON l.qid = p.vec_id AND l.j = cd.j AND l.c = cd.code
          GROUP BY 1, 2, 3
        ){tail}
    """


def _minhash_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 5,
    tau: float = 0.7,
    seed: int = 42,
) -> str:
    coeffs = D.minhash_coefficients(num_hashes, seed)
    M = (1 << 31) - 1
    mins = ",\n                 ".join(
        f"min(({a} * hm + {b}) % {M}) AS s{p}"
        for p, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_conds = "\n             OR ".join(
        "("
        + " AND ".join(f"a.s{b * rpb + j} = b.s{b * rpb + j}" for j in range(rpb))
        + ")"
        for b in range(bands)
    )
    agree = "\n               + ".join(
        f"(CASE WHEN a.s{p} = b.s{p} THEN 1 ELSE 0 END)"
        for p in range(num_hashes)
    )
    return f"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(list_transform(
                     range(1, greatest(length(text) - {shingle - 1}, 1) + 1),
                     i -> ('0x' || substr(md5(substr(text, i, {shingle})),
                                          1, 15))::BIGINT % {M}
                 )) AS hm
          FROM documents
        ), sig AS (
          SELECT doc_id,
                 {mins}
          FROM ex GROUP BY doc_id
        ), dropped AS (
          SELECT DISTINCT b.doc_id
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           AND ({band_conds})
          WHERE CAST({agree} AS DOUBLE) / {num_hashes} >= {tau}
        )
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
        GROUP BY d.lang
    """


def q_adversarial_dedup_stats(spark, sf_dir):
    # The hot-bucket pathology, graded: 10^4 byte-identical docs (must
    # collapse to ONE banded row), a 2000-doc near-dup clique (hot
    # buckets > cap -> star comparison), and the id-shifted base
    # corpus. The oracle replays signature collapse, bucket-tuple
    # grouping, the cap-128 star/all-pairs split, and the agreement
    # check in SQL — value parity locks the guard's exact semantics.
    from . import adversarial as A

    docs = _read(spark, sf_dir, "documents")
    corpus = A.adversarial_corpus(spark, docs)
    kept = D.minhash_lsh_dedup(
        corpus, "text", "doc_id", num_hashes=32, bands=8,
        min_signature_similarity=0.7, signature_fn="md5",
        hot_bucket_cap=128,
    )
    return kept.groupBy(A.segment_column().alias("segment")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
    )


def _adversarial_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 5,
    tau: float = 0.7,
    seed: int = 42,
    cap: int = 128,
) -> str:
    # Replays minhash_lsh_dedup's guarded semantics end to end:
    # md5-shingle signatures -> collapse identical signatures to the
    # min-id representative -> band buckets keyed by the signature
    # tuple (Spark keys by xxhash64 of the same tuple — identical
    # grouping modulo 64-bit hash collisions) -> all-pairs for buckets
    # <= cap, min-id star above -> agreement >= tau -> drop set.
    from . import adversarial as A

    coeffs = D.minhash_coefficients(num_hashes, seed)
    M = (1 << 31) - 1
    mins = ",\n                 ".join(
        f"min(({a} * hm + {b}) % {M}) AS s{p}"
        for p, (a, b) in enumerate(coeffs)
    )
    sig_cols = ", ".join(f"s{p}" for p in range(num_hashes))
    rpb = num_hashes // bands
    banded = "\n          UNION ALL\n          ".join(
        f"SELECT doc_id, {b} AS band, concat_ws('_', "
        + ", ".join(f"s{b * rpb + j}" for j in range(rpb))
        + ") AS bk FROM rsig"
        for b in range(bands)
    )
    agree = "\n               + ".join(
        f"(CASE WHEN a.s{p} = b.s{p} THEN 1 ELSE 0 END)"
        for p in range(num_hashes)
    )
    return f"""
        WITH corpus AS ({A.adversarial_corpus_sql()}),
        ex AS (
          SELECT doc_id,
                 unnest(list_transform(
                     range(1, greatest(length(text) - {shingle - 1}, 1) + 1),
                     i -> ('0x' || substr(md5(substr(text, i, {shingle})),
                                          1, 15))::BIGINT % {M}
                 )) AS hm
          FROM corpus
        ), sig AS (
          SELECT doc_id,
                 {mins}
          FROM ex GROUP BY doc_id
        ), rep AS (
          SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY {sig_cols}) AS rp
          FROM sig
        ), rsig AS (
          SELECT s.* FROM sig s
          JOIN rep r ON s.doc_id = r.doc_id AND r.doc_id = r.rp
        ), banded AS (
          {banded}
        ), bstats AS (
          SELECT band, bk, count(*) AS n, min(doc_id) AS mn
          FROM banded GROUP BY band, bk
        ), cand AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb
          FROM banded a
          JOIN banded b ON a.band = b.band AND a.bk = b.bk
                        AND a.doc_id < b.doc_id
          JOIN bstats s ON s.band = a.band AND s.bk = a.bk
          WHERE s.n <= {cap}
          UNION
          SELECT s.mn AS ida, m.doc_id AS idb
          FROM banded m
          JOIN bstats s ON s.band = m.band AND s.bk = m.bk
          WHERE s.n > {cap} AND m.doc_id <> s.mn
        ), dropped AS (
          SELECT doc_id FROM rep WHERE doc_id <> rp
          UNION
          SELECT c.idb AS doc_id
          FROM cand c
          JOIN rsig a ON a.doc_id = c.ida
          JOIN rsig b ON b.doc_id = c.idb
          WHERE CAST({agree} AS DOUBLE) / {num_hashes} >= {tau}
        )
        SELECT CASE WHEN doc_id < {A.IDENTICAL_BASE} THEN 'clique'
                    WHEN doc_id < {A.BASE_SHIFT} THEN 'identical'
                    ELSE 'base' END AS segment,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS sum_ids
        FROM corpus
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        GROUP BY 1
    """


def _crosscorpus_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 5,
    tau: float = 0.7,
    seed: int = 42,
) -> str:
    # Same signature/band/agreement replay as _minhash_oracle_sql, but
    # corpus (doc_id % 10 != 0) joined against benchmark (% 10 = 0).
    coeffs = D.minhash_coefficients(num_hashes, seed)
    M = (1 << 31) - 1
    mins = ",\n                 ".join(
        f"min(({a} * hm + {b}) % {M}) AS s{p}"
        for p, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_conds = "\n             OR ".join(
        "("
        + " AND ".join(
            f"a.s{b * rpb + j} = b.s{b * rpb + j}" for j in range(rpb)
        )
        + ")"
        for b in range(bands)
    )
    agree = "\n               + ".join(
        f"(CASE WHEN a.s{p} = b.s{p} THEN 1 ELSE 0 END)"
        for p in range(num_hashes)
    )
    return f"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(list_transform(
                     range(1, greatest(length(text) - {shingle - 1}, 1) + 1),
                     i -> ('0x' || substr(md5(substr(text, i, {shingle})),
                                          1, 15))::BIGINT % {M}
                 )) AS hm
          FROM documents
        ), sig AS (
          SELECT doc_id,
                 {mins}
          FROM ex GROUP BY doc_id
        ), dropped AS (
          SELECT DISTINCT a.doc_id
          FROM sig a JOIN sig b
            ON a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
           AND ({band_conds})
          WHERE CAST({agree} AS DOUBLE) / {num_hashes} >= {tau}
        )
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
        FROM documents d
        WHERE d.doc_id % 10 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
        GROUP BY d.lang
    """


def q_crosscorpus_decontaminated(spark, sf_dir):
    # Near-dup DECONTAMINATION across corpora: drop training docs whose
    # MinHash signature band-collides AND agrees >= 0.7 with any
    # held-out benchmark doc (doc_id % 10 == 0 plays the benchmark).
    docs = _read(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 != 0")
    benchmark = docs.filter("doc_id % 10 = 0")
    kept = D.crosscorpus_decontaminate(
        corpus, benchmark, "text", "doc_id",
        num_hashes=32, bands=8, min_signature_similarity=0.7,
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def _incremental_dedup_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 5,
    tau: float = 0.7,
    seed: int = 42,
) -> str:
    # Same signature/band/agreement replay as _minhash_oracle_sql, but
    # modelling two incremental batches: batch1 (doc_id % 7 = 1) dedups
    # against the corpus (% 7 not in (1,2)); batch2 (% 7 = 2) dedups
    # against corpus + the KEPT part of batch1 (the extended index).
    coeffs = D.minhash_coefficients(num_hashes, seed)
    M = (1 << 31) - 1
    mins = ",\n                 ".join(
        f"min(({a} * hm + {b}) % {M}) AS s{p}"
        for p, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_conds = "\n             OR ".join(
        "("
        + " AND ".join(
            f"a.s{b * rpb + j} = b.s{b * rpb + j}" for j in range(rpb)
        )
        + ")"
        for b in range(bands)
    )
    agree = "\n               + ".join(
        f"(CASE WHEN a.s{p} = b.s{p} THEN 1 ELSE 0 END)"
        for p in range(num_hashes)
    )
    return f"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(list_transform(
                     range(1, greatest(length(text) - {shingle - 1}, 1) + 1),
                     i -> ('0x' || substr(md5(substr(text, i, {shingle})),
                                          1, 15))::BIGINT % {M}
                 )) AS hm
          FROM documents
        ), sig AS (
          SELECT doc_id,
                 {mins}
          FROM ex GROUP BY doc_id
        ), drop1 AS (
          SELECT DISTINCT a.doc_id
          FROM sig a JOIN sig b
            ON a.doc_id % 7 = 1 AND b.doc_id % 7 NOT IN (1, 2)
           AND ({band_conds})
          WHERE CAST({agree} AS DOUBLE) / {num_hashes} >= {tau}
        ), kept1 AS (
          SELECT doc_id FROM documents
          WHERE doc_id % 7 = 1 AND doc_id NOT IN (SELECT doc_id FROM drop1)
        ), drop2 AS (
          SELECT DISTINCT a.doc_id
          FROM sig a JOIN sig b
            ON a.doc_id % 7 = 2
           AND (b.doc_id % 7 NOT IN (1, 2)
                OR b.doc_id IN (SELECT doc_id FROM kept1))
           AND ({band_conds})
          WHERE CAST({agree} AS DOUBLE) / {num_hashes} >= {tau}
        ), kept AS (
          SELECT doc_id FROM kept1
          UNION ALL
          SELECT doc_id FROM documents
          WHERE doc_id % 7 = 2 AND doc_id NOT IN (SELECT doc_id FROM drop2)
        )
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
        FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM kept)
        GROUP BY d.lang
    """


def q_incremental_dedup(spark, sf_dir):
    # Incremental-crawl dedup through the persisted MinHash index:
    # build the index on the corpus once, dedup batch1 against it,
    # EXTEND the index with batch1's kept rows (only they are signed),
    # then dedup batch2 against the extended index. The oracle replays
    # both rounds in SQL.
    docs = _read(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 7 NOT IN (1, 2)")
    batch1 = docs.filter("doc_id % 7 = 1")
    batch2 = docs.filter("doc_id % 7 = 2")
    idx = D.build_minhash_index(
        corpus, "text", "doc_id", num_hashes=32, bands=8, signature_fn="md5"
    )
    # Sign batch1 once (checkpointed) — the query and the extend both
    # reuse the banded rows, identical values to signing twice.
    banded1 = D.banded_batch(idx, batch1).localCheckpoint(eager=True)
    kept1 = D.dedup_against_index(
        idx, batch1, min_signature_similarity=0.7, broadcast_batch=True,
        banded_new=banded1,
    ).localCheckpoint(eager=True)  # read by extend AND the union below
    idx2 = D.extend_minhash_index(
        idx, kept1,
        banded_new=banded1.join(
            kept1.select(F.col("doc_id").alias("__id__")),
            on="__id__", how="leftsemi",
        ),
    )
    kept2 = D.dedup_against_index(
        idx2, batch2, min_signature_similarity=0.7, broadcast_batch=True
    )
    return (
        kept1.unionByName(kept2)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def _index_compaction_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 5,
    tau: float = 0.7,
    seed: int = 42,
) -> str:
    # Same signature/band/agreement replay as _minhash_oracle_sql.
    # Compaction semantics: the effective index corpus is (doc_id % 5
    # != 0) minus the deleted ids (doc_id % 10 = 3); the re-extended
    # duplicate rows collapse away, so they don't appear here at all —
    # which is exactly what the query asserts. index_ids / index_rows
    # check the compacted table's size arithmetic (one row per id per
    # band).
    coeffs = D.minhash_coefficients(num_hashes, seed)
    M = (1 << 31) - 1
    mins = ",\n                 ".join(
        f"min(({a} * hm + {b}) % {M}) AS s{p}"
        for p, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_conds = "\n             OR ".join(
        "("
        + " AND ".join(
            f"a.s{b * rpb + j} = b.s{b * rpb + j}" for j in range(rpb)
        )
        + ")"
        for b in range(bands)
    )
    agree = "\n               + ".join(
        f"(CASE WHEN a.s{p} = b.s{p} THEN 1 ELSE 0 END)"
        for p in range(num_hashes)
    )
    return f"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(list_transform(
                     range(1, greatest(length(text) - {shingle - 1}, 1) + 1),
                     i -> ('0x' || substr(md5(substr(text, i, {shingle})),
                                          1, 15))::BIGINT % {M}
                 )) AS hm
          FROM documents
        ), sig AS (
          SELECT doc_id,
                 {mins}
          FROM ex GROUP BY doc_id
        ), idx_ids AS (
          SELECT doc_id FROM documents
          WHERE doc_id % 5 <> 0 AND doc_id % 10 <> 3
        ), dropped AS (
          SELECT DISTINCT a.doc_id
          FROM sig a JOIN sig b
            ON a.doc_id % 5 = 0
           AND b.doc_id IN (SELECT doc_id FROM idx_ids)
           AND ({band_conds})
          WHERE CAST({agree} AS DOUBLE) / {num_hashes} >= {tau}
        )
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
               (SELECT count(*) FROM idx_ids) AS index_ids,
               (SELECT count(*) * {bands} FROM idx_ids) AS index_rows
        FROM documents d
        WHERE d.doc_id % 5 = 0
          AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
        GROUP BY d.lang
    """


def q_index_compaction(spark, sf_dir):
    # Index lifecycle for a months-long crawl: build the MinHash index,
    # RE-extend an already-indexed slice (duplicate band rows, as a
    # re-crawled batch produces), then compact with a deletion list
    # (docs removed from the corpus). Compaction collapses duplicates
    # to one row per (id, band) and drops deleted ids, so a probe batch
    # deduped against the compacted index sees exactly the surviving
    # corpus — the oracle replays that effective corpus in SQL, and
    # index_ids/index_rows check the compacted table's size arithmetic.
    docs = _read(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 5 != 0")
    probe = docs.filter("doc_id % 5 = 0")
    idx = D.build_minhash_index(
        corpus, "text", "doc_id", num_hashes=32, bands=8, signature_fn="md5"
    )
    idx = D.extend_minhash_index(idx, corpus.filter("doc_id % 5 = 1"))
    deleted = corpus.filter("doc_id % 10 = 3").select("doc_id")
    compacted = idx.compact(deleted_ids=deleted)
    st = compacted.stats()
    kept = D.dedup_against_index(
        compacted, probe, min_signature_similarity=0.7, broadcast_batch=True
    )
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .withColumn("index_ids", F.lit(int(st["ids"])).cast("long"))
        .withColumn("index_rows", F.lit(int(st["rows"])).cast("long"))
    )


def q_streaming_incremental_dedup(spark, sf_dir):
    # The SAME two-batch incremental dedup as incremental_dedup, but
    # executed as a genuine Structured Streaming job: the two batches
    # are staged as separate files (mtime-ordered), readStream with
    # maxFilesPerTrigger=1 delivers them as two micro-batches, and a
    # foreachBatch dedup (stream-stream anti joins are unsupported —
    # foreachBatch is the idiomatic escape hatch) extends the index
    # between batches. Value-checked against the identical SQL oracle.
    import shutil
    import tempfile
    import time as _time

    from .. import streaming as ST

    docs = _read(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 7 NOT IN (1, 2)")
    idx = D.build_minhash_index(
        corpus, "text", "doc_id", num_hashes=32, bands=8, signature_fn="md5"
    )

    tmp = tempfile.mkdtemp(prefix="tas_stream_dedup_")
    stage = os.path.join(tmp, "batches")
    out_dir = os.path.join(tmp, "kept")
    os.makedirs(stage)
    # Stage batch1 then batch2 as single files with increasing mtimes so
    # the file source (oldest first) delivers them in order. Driver-side
    # Arrow writes (toArrow + pq.write_table): each batch is a bounded
    # slice, bytes identical, and the per-batch coalesce(1) Spark write
    # jobs disappear (the sessionize staging lesson).
    import pyarrow.parquet as pq

    n_staged = 0
    for i, pred in enumerate(["doc_id % 7 = 1", "doc_id % 7 = 2"]):
        tbl = docs.filter(pred).toArrow()
        n_staged += tbl.num_rows
        dst = os.path.join(stage, f"batch-{i}.parquet")
        pq.write_table(tbl, dst)
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)

    def write_kept(kept, batch_id):
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    fn = ST.make_index_dedup_batch_fn(
        idx, write_kept, min_signature_similarity=0.7
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    from ..utils import stream_state_partitions

    # No state store here (foreachBatch), but the per-batch dedup
    # joins inherit the session shuffle setting — size them to the
    # staged batch volume for the stream's duration.
    with stream_state_partitions(spark, rows=n_staged):
        q = (
            stream.writeStream.foreachBatch(fn)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    kept = spark.read.parquet(out_dir).localCheckpoint(eager=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def q_streaming_sessionize_stats(spark, sf_dir):
    # The custom stateful streaming operator (applyInPandasWithState
    # sessionization) value-matched against the BATCH window
    # formulation: real events arrive as micro-batch 1, a far-future
    # sentinel event as micro-batch 2 pushes the watermark past every
    # real session so they ALL close and emit; the sentinel's own
    # (still-open) session is excluded. Shares sessionize_stats'
    # oracle — the stateful stream must reproduce the batch windows
    # exactly.
    import shutil
    import tempfile
    import uuid

    from ..streaming.sessionize import sessionize_events

    # A quarter of the users keeps the staged write + per-user state
    # cost proportionate while exercising identical semantics (the
    # oracle applies the same predicate).
    ev = (
        _events_ts(spark, sf_dir)
        .filter("user_id % 4 = 0")
        .select("user_id", F.col("ts").alias("event_time"), "value")
    )
    tmp = tempfile.mkdtemp(prefix="tas_stream_sess_")
    stage = os.path.join(tmp, "events")
    os.makedirs(stage)
    sentinel = spark.createDataFrame(
        [(999_999_999, "2035-01-01 00:00:00", 0.0)],
        "user_id long, event_time string, value double",
    ).select(
        "user_id",
        F.col("event_time").cast("timestamp").alias("event_time"),
        "value",
    )
    # Stage each micro-batch file with one driver-side Arrow write
    # (toArrow + pq.write_table) instead of a coalesce(1) Spark write
    # job per batch: the rows are a bounded slice the driver holds
    # anyway, the bytes are identical, and the two single-task write
    # jobs (measured ~8 s cold, ~2 s warm at sf0.1) disappear.
    import pyarrow.parquet as pq

    n_staged = 0
    for i, part in enumerate([ev, sentinel]):
        tbl = part.toArrow()
        n_staged += tbl.num_rows
        dst = os.path.join(stage, f"batch-{i}.parquet")
        pq.write_table(tbl, dst)
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)

    stream = (
        spark.readStream.schema(
            "user_id long, event_time timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    sessions = sessionize_events(stream, gap="30 minutes")
    name = f"tas_sess_{uuid.uuid4().hex[:8]}"
    from ..utils import stream_state_partitions

    # State partitions sized to the staged volume, not the session's
    # batch shuffle setting — see utils.stream_state_partitions.
    with stream_state_partitions(spark, rows=n_staged):
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    out = spark.table(name).filter("user_id != 999999999")
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(tmp, ignore_errors=True)
    span_us = F.unix_micros("session_end") - F.unix_micros("session_start")
    return out.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(
            F.sum("n_events") / F.count(F.lit(1)), 6
        ).alias("avg_events"),
        F.max("n_events").alias("max_events"),
        F.round(
            F.sum(span_us) / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 3
        ).alias("avg_span_sec"),
    )


def q_domain_capped_stats(spark, sf_dir):
    # Per-domain document cap (40 docs/source, md5-rank selection), then
    # per-source counts + kept characters. The sum over kept n_chars
    # proves WHICH rows were selected, not just how many.
    docs = _read(spark, sf_dir, "documents")
    capped = P.cap_per_group(docs, "source", "doc_id", max_rows=40)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_export_shard_stats(spark, sf_dir):
    # Genuine sink round-trip: write documents as 8 deterministic JSONL
    # shards, read them back, and aggregate per shard. The oracle
    # replays the md5 shard assignment on the source table — matching
    # values prove the written files carry exactly the assigned rows.
    import tempfile

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # Per-application path: repeated runs WITHIN one Spark session reuse
    # the directory (no temp-dir leak per invocation), while concurrent
    # bench/driver runs on the same host get distinct directories — a
    # fixed shared path would let one run's read-back observe another's
    # partially rewritten files (or collide with another user's
    # pre-created /tmp entry).
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_shard_export_{spark.sparkContext.applicationId}",
    )
    back = P.export_shards(docs, path, "doc_id", n_shards=8, format="json")
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_epoch_shuffle_stats(spark, sf_dir):
    # Deterministic epoch shuffle: seed-keyed md5 permutation into 8
    # shards with contiguous in-shard positions. The checksum
    # sum(pos * doc_id) is order-SENSITIVE, so a hash match proves the
    # exact permutation (not just the shard split) replays in SQL.
    docs = _read(spark, sf_dir, "documents")
    sh = P.epoch_shuffle(docs, "doc_id", seed=1, n_shards=8)
    return sh.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
    )


ORACLE_EPOCH_SHUFFLE = """
    WITH keyed AS (
      SELECT doc_id,
             ('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)),
                             1, 13))::BIGINT AS ek
      FROM documents
    ), ranked AS (
      SELECT doc_id, CAST(ek % 8 AS INT) AS shard,
             row_number() OVER (PARTITION BY ek % 8
                                ORDER BY ek, doc_id) AS pos
      FROM keyed
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(pos) AS INT) AS min_pos,
           CAST(max(pos) AS INT) AS max_pos,
           CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
    FROM ranked GROUP BY shard
"""


def q_greedy_pack_stats(spark, sf_dir):
    # Boundary-respecting sequence packing: whole documents greedily
    # packed into 2048-char sequences in seed-keyed md5 order within 8
    # shards. The checksum sum(seq * doc_id + seq_offset) is order- and
    # assignment-SENSITIVE, so the hash match proves the exact packing
    # walk (not just aggregate counts) — the oracle replays the
    # sequential greedy rule with a recursive CTE.
    docs = _read(spark, sf_dir, "documents")
    packed = P.pack_documents_greedy(
        docs, "doc_id", "n_chars", max_length=2048, n_shards=8, seed=1
    )
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.max("seq") + 1).alias("n_seqs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(
            F.col("seq") * F.col("doc_id") + F.col("seq_offset")
        ).alias("pack_checksum"),
    )


ORACLE_GREEDY_PACK = """
    WITH RECURSIVE keyed AS (
      SELECT doc_id, coalesce(n_chars, 0) AS n_chars,
             ('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)),
                             1, 13))::BIGINT AS pk
      FROM documents
    ), sharded AS (
      SELECT doc_id, n_chars, CAST(pk % 8 AS INT) AS shard,
             row_number() OVER (PARTITION BY pk % 8
                                ORDER BY pk, doc_id) AS rn
      FROM keyed
    ), walk AS (
      SELECT shard, rn, doc_id, n_chars,
             CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS off,
             CAST(n_chars AS BIGINT) AS used
      FROM sharded WHERE rn = 1
      UNION ALL
      SELECT s.shard, s.rn, s.doc_id, s.n_chars,
             CASE WHEN w.used + s.n_chars > 2048
                  THEN w.seq + 1 ELSE w.seq END,
             CASE WHEN w.used + s.n_chars > 2048
                  THEN CAST(0 AS BIGINT) ELSE w.used END,
             CASE WHEN w.used + s.n_chars > 2048
                  THEN CAST(s.n_chars AS BIGINT)
                  ELSE w.used + s.n_chars END
      FROM walk w JOIN sharded s
        ON s.shard = w.shard AND s.rn = w.rn + 1
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(seq) + 1 AS BIGINT) AS n_seqs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(seq * doc_id + off) AS BIGINT) AS pack_checksum
    FROM walk GROUP BY shard
"""


def q_webdataset_export_stats(spark, sf_dir):
    # WebDataset-style tar-shard sink round trip: write documents as 8
    # deterministic tar shards (two members per sample: <key>.txt =
    # the text bytes, <key>.lang = the language tag), parse the tars
    # BACK in executor tasks, and report per-shard sample/file/byte
    # totals. The oracle replays the md5 shard assignment and the
    # UTF-8 byte lengths on the source table — matching values prove
    # the tars carry exactly the assigned samples with intact bytes.
    import tempfile

    docs = _read(spark, sf_dir, "documents")
    # Shard count derives from corpus size (floor 8 — identical to the
    # old pinned value at every driver-graded sf; 32 at sf100) so the
    # single-threaded-per-shard tar write scales with cores: measured
    # 295 s -> 121 s at sf100. The oracle recomputes the same
    # greatest(8, ceil(n/160k)).
    n_shards = P.derive_n_shards(docs.count())
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_wds_export_{spark.sparkContext.applicationId}",
    )
    manifest = P.export_webdataset(
        docs, path, "doc_id", {"txt": "text", "lang": "lang"},
        n_shards=n_shards,
    )
    return manifest.select(
        "shard", "n_samples", "n_files", "txt_bytes", "lang_bytes"
    )


ORACLE_WEBDATASET = """
    WITH p AS (
      SELECT greatest(8, CAST(ceil(count(*) / 160000.0) AS BIGINT)) AS ns
      FROM documents
    )
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                % p.ns AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(2 * count(*) AS BIGINT) AS n_files,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS txt_bytes,
           CAST(sum(octet_length(encode(lang))) AS BIGINT) AS lang_bytes
    FROM documents CROSS JOIN p
    GROUP BY 1
"""


#: Target mixture for the token-budget mixing query: five domains at
#: equal weight, everything else dropped.
MIX_WEIGHTS = {f"src{i}": 0.2 for i in range(5)}
MIX_BUDGET = 20_000


def q_mix_budget_stats(spark, sf_dir):
    # Epoch mixing: downsample each weighted domain to its share of a
    # 20k-char budget (md5-deterministic keeps); unweighted domains get
    # rate 0. The oracle recomputes rates from the same totals and
    # replays the md5 uniform.
    docs = _read(spark, sf_dir, "documents")
    mixed = P.mix_to_token_budget(
        docs, "source", "n_chars", "doc_id", MIX_WEIGHTS, MIX_BUDGET
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_quality_logit_stats(spark, sf_dir):
    # Linear quality-classifier inference (rational features only, so
    # the logits replay bit-for-bit in SQL); min/max are order-
    # independent, unlike a float sum.
    docs = _read(spark, sf_dir, "documents")
    scored = X.quality_logit(docs, "text")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.round(F.min("logit"), 6).alias("min_logit"),
        F.round(F.max("logit"), 6).alias("max_logit"),
    )


def q_prep_pipeline_stats(spark, sf_dir):
    # Full training-data prep pipeline, composed end-to-end: classifier
    # filter -> C4 span dedup -> per-domain cap -> train/val split ->
    # per-split stats. Every stage is the real operator; the oracle
    # chains the stages' proven SQL replays.
    docs = _read(spark, sf_dir, "documents")
    kept = (
        X.quality_logit(docs, "text").filter("keep").drop("logit", "keep")
    )
    dd = D.dedup_segments(kept, "text", "doc_id", seg_tokens=8)
    nonempty = dd.filter(F.length("text_dedup") > 0)
    capped = P.cap_per_group(nonempty, "source", "doc_id", max_rows=15)
    split = P.split_dataset(capped, "doc_id", {"train": 0.9, "val": 0.1})
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text_dedup")).alias("sum_chars"),
    )


def q_dataset_split_stats(spark, sf_dir):
    # Deterministic 80/10/10 split on md5(doc_id); per-split counts and
    # kept characters prove exactly which rows landed where.
    docs = _read(spark, sf_dir, "documents")
    out = P.split_dataset(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_top_ngrams(spark, sf_dir):
    # Corpus-wide boilerplate mining: the 15 most frequent word 5-grams
    # (deterministic gram tie-break). Global top-k compiles to
    # TakeOrderedAndProject — per-partition heaps, no full sort.
    docs = _read(spark, sf_dir, "documents")
    return X.top_ngrams(docs, "text", n=5, k=15)


def q_decode_audio(spark, sf_dir):
    # Real PCM16 WAV decode over synthesized spec-conformant payloads:
    # frame counts and exact |sample| sums are recomputed in SQL from
    # the same integer formulas (RIFF chunk walk must be right).
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = _read(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_wav(
                    50 + int(d) % 40, 8000 + (int(d) % 3) * 4000, int(d)
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_wav = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    return M.decode_audio(with_wav, "payload").select(
        "doc_id", "sample_rate", "n_samples", "sum_abs", "peak"
    )


def q_audio_frame_features(spark, sf_dir):
    # Frame-level audio features (energy / zero-crossings / peak over
    # 32-sample frames of channel 0). Summing per-frame ZCR ≠ global
    # ZCR (boundary crossings are excluded), so the oracle proves the
    # framing itself, replayed from the synthesizer's integer formula.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id % 10 = 0")
    )

    def make(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_wav(50 + int(d) % 40, 16000, int(d))
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_wav = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    fr = M.audio_frame_features(with_wav, "payload", frame_samples=32)
    return fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum("energy").cast("long").alias("total_energy"),
        F.sum("zero_crossings").cast("long").alias("total_zc"),
        F.max("frame_peak").cast("long").alias("max_peak"),
    )


def q_decode_audio_mulaw(spark, sf_dir):
    # G.711 mu-law WAV decode (fmt tag 7): the oracle replays the exact
    # integer expansion (audioop-equivalent) from the synthesized byte
    # formula — only matches if the chunk walk AND the companding math
    # are right.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id % 10 = 1")
    )

    def make(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_wav_mulaw(40 + int(d) % 50, 8000, int(d))
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_wav = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    return M.decode_audio(with_wav, "payload").select(
        "doc_id", "sample_rate", "n_samples", "sum_abs", "peak"
    )


def q_decode_audio_alaw(spark, sf_dir):
    # G.711 A-law expansion (fmt tag 6) — the mu-law sibling; every
    # expanded sample's integer arithmetic replays in SQL.
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id % 10 = 2")
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_wav_alaw(40 + int(d) % 50, 8000, int(d))
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_wav = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    return M.decode_audio(with_wav, "payload").select(
        "doc_id", "sample_rate", "n_samples", "sum_abs", "peak"
    )


def q_decode_image_interlaced(spark, sf_dir):
    # Adam7-interlaced PNG decode: payloads synthesized with the shared
    # position formula (flat sample i = (seed*7 + i*13) % 256 addressed
    # by FULL-IMAGE position), seven passes extracted and filtered per
    # the spec. pos_checksum = sum(sample_i * (i+1)) is position-
    # sensitive, so the oracle match grades the pass-to-position
    # scatter itself — a plain pixel_sum cannot (de-interleaving
    # preserves the sample multiset). Color type varies per doc
    # (gray / RGB / RGBA / palette) via doc_id // 10, which takes all
    # residues under the % 10 = 6 filter (doc_id % 4 there only hits
    # {0, 2}, so gray/RGBA would be the only types exercised).
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id % 10 = 6")
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_png(
                    3 + (int(d) // 10) % 12,
                    2 + (int(d) // 10) % 11,
                    int(d),
                    color_type=[0, 2, 6, 3][(int(d) // 10) % 4],
                    interlace=True,
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_png = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    return M.decode_png_verified(with_png, "payload").select(
        "doc_id", "height", "width", "channels", "pixel_sum",
        "pos_checksum",
    )


ORACLE_PNG_INTERLACED = """
    WITH d AS (
      SELECT doc_id,
             3 + (doc_id // 10) % 12 AS w,
             2 + (doc_id // 10) % 11 AS h,
             (doc_id // 10) % 4 AS ctsel
      FROM documents WHERE doc_id % 10 = 6
    ), dims AS (
      SELECT doc_id, w, h, ctsel,
             CASE ctsel WHEN 0 THEN 1 WHEN 1 THEN 3
                        WHEN 2 THEN 4 ELSE 1 END AS bpp
      FROM d
    ), s AS (
      SELECT doc_id, w, h, ctsel, bpp,
             unnest(range(0, w * h * bpp)) AS i
      FROM dims
    ), v AS (
      SELECT doc_id, w, h, ctsel, bpp, i,
             (doc_id * 7 + i * 13) % 256 AS raw
      FROM s
    ), px AS (
      -- palette images (ctsel 3) map index p, channel c to
      -- (p*5 + c*11 + 3) % 256 and report 3 channels; others pass raw.
      SELECT doc_id, w, h, ctsel,
             CASE WHEN ctsel = 3 THEN i * 3 + c.c ELSE i END AS j,
             CASE WHEN ctsel = 3 THEN (raw * 5 + c.c * 11 + 3) % 256
                  ELSE raw END AS val
      FROM v, (SELECT unnest(range(0, 3)) AS c) c
      WHERE ctsel = 3 OR c.c = 0
    )
    SELECT doc_id,
           CAST(max(h) AS INTEGER) AS height,
           CAST(max(w) AS INTEGER) AS width,
           CAST(CASE max(ctsel) WHEN 0 THEN 1 WHEN 1 THEN 3
                                WHEN 2 THEN 4 ELSE 3 END AS INTEGER)
             AS channels,
           CAST(sum(val) AS BIGINT) AS pixel_sum,
           CAST(sum(val * (j + 1)) AS BIGINT) AS pos_checksum
    FROM px GROUP BY doc_id
"""


def q_decode_image_png16(spark, sf_dir):
    # 16-bit PNG decode (gray / RGB / RGBA, plain AND Adam7): PNG
    # filters operate on BYTES, so sample j decodes to 256*b(2j) +
    # b(2j+1) with b the shared byte formula — the oracle recomputes
    # exactly that, and pos_checksum grades positions through the
    # byte-pair combination and (for interlaced docs) the Adam7
    # scatter. Knobs derive from doc_id // 10, which takes ALL
    # residues under the % 10 = 8 filter (doc_id itself is always
    # even there, so d % 2 would never pick interlace).
    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id % 10 = 8")
    )

    def make(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                M.synthesize_png(
                    3 + (int(d) // 10) % 10,
                    2 + (int(d) // 10) % 9,
                    int(d),
                    color_type=[0, 2, 6][(int(d) // 10) % 3],
                    interlace=(int(d) // 10) % 2 == 1,
                    depth=16,
                )
                for d in pdf["doc_id"]
            ]
            yield pdf

    with_png = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    return M.decode_png_verified(with_png, "payload").select(
        "doc_id", "height", "width", "channels", "pixel_sum",
        "pos_checksum",
    )


ORACLE_PNG16 = """
    WITH d AS (
      SELECT doc_id,
             3 + (doc_id // 10) % 10 AS w,
             2 + (doc_id // 10) % 9 AS h,
             CASE (doc_id // 10) % 3
               WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch
      FROM documents WHERE doc_id % 10 = 8
    ), s AS (
      SELECT doc_id, w, h, nch,
             unnest(range(0, w * h * nch)) AS j
      FROM d
    ), v AS (
      SELECT doc_id, w, h, nch, j,
             256 * ((doc_id * 7 + (2 * j) * 13) % 256)
               + ((doc_id * 7 + (2 * j + 1) * 13) % 256) AS val
      FROM s
    )
    SELECT doc_id,
           CAST(max(h) AS INTEGER) AS height,
           CAST(max(w) AS INTEGER) AS width,
           CAST(max(nch) AS INTEGER) AS channels,
           CAST(sum(val) AS BIGINT) AS pixel_sum,
           CAST(sum(val * (j + 1)) AS BIGINT) AS pos_checksum
    FROM v GROUP BY doc_id
"""


def q_decode_audio_flac(spark, sf_dir):
    # Native FLAC decode (Rice-coded residuals, CRC-verified):
    # payloads synthesized per doc with the shared SQL sample formula
    # ((id*31 + i*17) % 65536 - 32768). Knobs derive from
    # e = doc_id // 10, which takes ALL residues under the % 10 = 4
    # filter (doc_id itself is always even there): predictor order
    # e % 5, 2^(e % 2) Rice partitions, STEREO frames for odd e
    # (decorrelation mode cycling left/right/mid-side by e % 3 — the
    # interleaved decode must reproduce the formula sequence, so the
    # side/mid integer reconstruction is value-graded too),
    # MULTI-FRAME files (two equal blocks; the >=128-frame UTF-8
    # frame-number coding is unit-tested) when e % 4 == 2, LPC
    # subframes (coefs [3, -1], shift 1) when e % 8 == 3, and 2
    # WASTED BITS (samples floored to multiples of 4 — e % 8 == 6 is
    # even, so mono: no mid/side divisibility clash) when e % 8 == 6.
    # The oracle replays the FORMULA — a match proves an exact
    # round-trip.
    import numpy as np

    from . import multimodal as M
    from pyspark.sql import types as T

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id % 10 = 4")
    )

    def make(batches):
        modes = ["left_side", "mid_side", "right_side"]
        for pdf in batches:
            pdf = pdf.copy()
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                e = d // 10
                n = 40 + 2 * (d % 25)
                stereo = e % 2 == 1
                i = np.arange(n * (2 if stereo else 1), dtype=np.int64)
                x = (d * 31 + i * 17) % 65536 - 32768
                kwargs = {}
                if e % 8 == 3:
                    kwargs["lpc"] = ([3, -1], 1)
                else:
                    kwargs["order"] = e % 5
                if e % 8 == 6:
                    x = (x >> 2) << 2
                    kwargs["wasted_bits"] = 2
                payloads.append(
                    M.synthesize_flac(
                        x.reshape(n, 2) if stereo else x,
                        8000,
                        partition_order=e % 2,
                        stereo_mode=modes[e % 3],
                        block_size=n // 2 if e % 4 == 2 else None,
                        **kwargs,
                    )
                )
            pdf["payload"] = payloads
            yield pdf

    with_flac = docs.mapInPandas(
        make,
        T.StructType(
            docs.schema.fields
            + [T.StructField("payload", T.BinaryType(), True)]
        ),
    )
    return M.decode_audio(with_flac, "payload").select(
        "doc_id", "sample_rate", "n_channels", "n_samples", "sum_abs",
        "peak",
    )


def q_segment_dedup_stats(spark, sf_dir):
    # C4-style span dedup (8-token segments, global first occurrence):
    # per-lang surviving-character totals prove exactly which segments
    # were kept. min/count are order-independent aggregates.
    docs = _read(spark, sf_dir, "documents")
    out = D.dedup_segments(docs, "text", "doc_id", seg_tokens=8)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text_dedup")).alias("sum_kept_chars"),
        F.sum(
            (F.length("text_dedup") == F.length(F.trim(F.col("text"))))
            .cast("long")
        ).alias("n_untouched"),
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "fingerprint_dedup": q_fingerprint_dedup,
    "minhash_dedup": q_minhash_dedup,
    "adversarial_dedup_stats": q_adversarial_dedup_stats,
    "substring_dedup_stats": q_substring_dedup_stats,
    "span_decontamination_stats": q_span_decontamination_stats,
    "incremental_dedup": q_incremental_dedup,
    "index_compaction": q_index_compaction,
    "streaming_incremental_dedup": q_streaming_incremental_dedup,
    "simhash_buckets": q_simhash_buckets,
    "ngram_jaccard": q_ngram_jaccard,
    "token_stats": q_token_stats,
    "quality_stats": q_quality_stats,
    "language_id": q_language_id,
    "ann_brute_topk": q_ann_brute_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_lsh_index_topk": q_ann_lsh_index_topk,
    "ann_ivf_index_topk": q_ann_ivf_index_topk,
    "ann_ivfpq_index_topk": q_ann_ivfpq_index_topk,
    "ann_recall_stats": q_ann_recall_stats,
    "event_hourly_rollup": q_event_hourly_rollup,
    "bpe_token_count": q_bpe_token_count,
    "media_metadata": q_media_metadata,
    "byte_histogram_features": q_byte_histogram_features,
    "cosine_dedup": q_cosine_dedup,
    "decode_image": q_decode_image,
    "decode_image_png": q_decode_image_png,
    "decode_image_gif": q_decode_image_gif,
    "decode_image_jpeg": q_decode_image_jpeg,
    "decode_image_progressive": q_decode_image_progressive,
    "quantize_embeddings": q_quantize_embeddings,
    "pipeline_compose": q_pipeline_compose,
    "normalize_text_stats": q_normalize_text_stats,
    "html_extract_stats": q_html_extract_stats,
    "warc_ingest_stats": q_warc_ingest_stats,
    "warc_http_framing_stats": q_warc_http_framing_stats,
    "wet_roundtrip_stats": q_wet_roundtrip_stats,
    "wat_roundtrip_stats": q_wat_roundtrip_stats,
    "streaming_wet_publish": q_streaming_wet_publish,
    "robots_gate_stats": q_robots_gate_stats,
    "robots_wildcard_stats": q_robots_wildcard_stats,
    "crawl_politeness_stats": q_crawl_politeness_stats,
    "crawl_schedule_stats": q_crawl_schedule_stats,
    "archive_fs_roundtrip_stats": q_archive_fs_roundtrip_stats,
    "streaming_warc_ingest": q_streaming_warc_ingest,
    "crawl_funnel_stats": q_crawl_funnel_stats,
    "c4_line_filter_stats": q_c4_line_filter_stats,
    "quality_train_stats": q_quality_train_stats,
    "quality_holdout_eval": q_quality_holdout_eval,
    "language_train_stats": q_language_train_stats,
    "language_id_confusion": q_language_id_confusion,
    "language_id_holdout_confusion": q_language_id_holdout_confusion,
    "language_id_production_holdout": q_language_id_production_holdout,
    "sentence_stats": q_sentence_stats,
    "html_metadata_stats": q_html_metadata_stats,
    "script_profile_stats": q_script_profile_stats,
    "bm25_topk": q_bm25_topk,
    "crawl_prep_stats": q_crawl_prep_stats,
    "pipeline_provenance_stats": q_pipeline_provenance_stats,
    "dsir_selection": q_dsir_selection,
    "repetition_stats": q_repetition_stats,
    "pii_stats": q_pii_stats,
    "stratified_sample": q_stratified_sample,
    "ngram_contamination": q_ngram_contamination,
    "bloom_contamination": q_bloom_contamination,
    "length_bucket_stats": q_length_bucket_stats,
    "domain_mix_weights": q_domain_mix_weights,
    "dedup_clusters": q_dedup_clusters,
    "pii_redacted_stats": q_pii_redacted_stats,
    "unigram_lm_stats": q_unigram_lm_stats,
    "bpe_merges": q_bpe_merges,
    "bpe_tokenized_stats": q_bpe_tokenized_stats,
    "cluster_representative_stats": q_cluster_representative_stats,
    "tfidf_top_terms": q_tfidf_top_terms,
    "streaming_hourly_rollup": q_streaming_hourly_rollup,
    "streaming_interval_join": q_streaming_interval_join,
    "streaming_html_ingest": q_streaming_html_ingest,
    "streaming_enriched_rollup": q_streaming_enriched_rollup,
    "streaming_sessionize_stats": q_streaming_sessionize_stats,
    "event_props_stats": q_event_props_stats,
    "url_canon_stats": q_url_canon_stats,
    "bigram_lm_stats": q_bigram_lm_stats,
    "dhash_stats": q_dhash_stats,
    "resize_image_stats": q_resize_image_stats,
    "dhash_dedup": q_dhash_dedup,
    "zorder_stats": q_zorder_stats,
    "cms_token_counts": q_cms_token_counts,
    "rollup_counts": q_rollup_counts,
    "mixed_media_pipeline": q_mixed_media_pipeline,
    "external_codec_decode": q_external_codec_decode,
    "chunk_vector_topk": q_chunk_vector_topk,
    "recency_sample_stats": q_recency_sample_stats,
    "soft_dedup_weights": q_soft_dedup_weights,
    "bpe_fertility": q_bpe_fertility,
    "minhash_estimator_error": q_minhash_estimator_error,
    "char_entropy_stats": q_char_entropy_stats,
    "column_profile": q_column_profile,
    "numeric_summary": q_numeric_summary,
    "corr_matrix": q_corr_matrix,
    "funnel_stats": q_funnel_stats,
    "ab_test": q_ab_test,
    "skew_report": q_skew_report,
    "incremental_embedding_dedup": q_incremental_embedding_dedup,
    "retention_cohorts": q_retention_cohorts,
    "sample_video_frames": q_sample_video_frames,
    "sessionize_stats": q_sessionize_stats,
    "asof_join_gap": q_asof_join_gap,
    "range_join_count": q_range_join_count,
    "interval_overlap_count": q_interval_overlap_count,
    "hll_user_rollup": q_hll_user_rollup,
    "quantile_sketch_rollup": q_quantile_sketch_rollup,
    "pack_sequences_stats": q_pack_sequences_stats,
    "sliding_chunk_stats": q_sliding_chunk_stats,
    "kmeans_cluster_stats": q_kmeans_cluster_stats,
    "semantic_dedup_stats": q_semantic_dedup_stats,
    "domain_capped_stats": q_domain_capped_stats,
    "export_shard_stats": q_export_shard_stats,
    "webdataset_export_stats": q_webdataset_export_stats,
    "epoch_shuffle_stats": q_epoch_shuffle_stats,
    "greedy_pack_stats": q_greedy_pack_stats,
    "mix_budget_stats": q_mix_budget_stats,
    "quality_logit_stats": q_quality_logit_stats,
    "segment_dedup_stats": q_segment_dedup_stats,
    "decode_audio": q_decode_audio,
    "audio_frame_features": q_audio_frame_features,
    "decode_audio_mulaw": q_decode_audio_mulaw,
    "decode_audio_alaw": q_decode_audio_alaw,
    "decode_audio_flac": q_decode_audio_flac,
    "decode_image_interlaced": q_decode_image_interlaced,
    "decode_image_png16": q_decode_image_png16,
    "winnow_fingerprint_stats": q_winnow_fingerprint_stats,
    "winnow_contamination": q_winnow_contamination,
    "event_anomaly_zscores": q_event_anomaly_zscores,
    "heaps_law_stats": q_heaps_law_stats,
    "gopher_prep_pipeline": q_gopher_prep_pipeline,
    "ngram_novelty": q_ngram_novelty,
    "dataset_card": q_dataset_card,
    "zipf_slope": q_zipf_slope,
    "doc_length_summary": q_doc_length_summary,
    "hashed_vector_stats": q_hashed_vector_stats,
    "gopher_flags": q_gopher_flags,
    "top_ngrams": q_top_ngrams,
    "dataset_split_stats": q_dataset_split_stats,
    "prep_pipeline_stats": q_prep_pipeline_stats,
    "crosscorpus_decontaminated": q_crosscorpus_decontaminated,
}


def _rates_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items()
    )
    return f"CASE lang {whens} ELSE 0.0 END"


#: Shared CTE fragment: distinct word 5-grams per document (matches
#: pipeline._token_ngrams tokenization: trim + \s+ split, space-joined).
_GRAMS5_CTE = """
        toks AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ),
        grams AS (
          SELECT doc_id, lang,
                 list_distinct(CASE WHEN len(tk) >= 5 THEN
                   list_transform(range(1, len(tk) - 3),
                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                          || ' ' || tk[i+3] || ' ' || tk[i+4])
                 ELSE []::VARCHAR[] END) AS gs
          FROM toks
        )
"""

ORACLES = {
    "dsir_selection": _DSIR_ORACLE,
    "simhash_buckets": _simhash_oracle_sql(),
    "minhash_dedup": _minhash_oracle_sql(),
    "adversarial_dedup_stats": _adversarial_oracle_sql(),
    "substring_dedup_stats": _SUBSTRING_DEDUP_ORACLE,
    "span_decontamination_stats": _SPAN_DECONTAMINATION_ORACLE,
    "incremental_dedup": _incremental_dedup_oracle_sql(),
    "index_compaction": _index_compaction_oracle_sql(),
    "streaming_incremental_dedup": _incremental_dedup_oracle_sql(),
    "crosscorpus_decontaminated": _crosscorpus_oracle_sql(),
    "ann_lsh_topk": _ann_lsh_oracle_sql(),
    "ann_ivf_topk": _ann_ivf_oracle_sql(),
    "ann_lsh_index_topk": _ann_lsh_oracle_sql(),
    "ann_ivf_index_topk": _ann_ivf_oracle_sql(
        auto_nlist=True, query_cap=ANN_INDEX_QUERY_CAP
    ),
    "ann_ivfpq_index_topk": _ann_ivfpq_oracle_sql(
        auto_nlist=True, query_cap=ANN_INDEX_QUERY_CAP
    ),
    "ann_recall_stats": _ann_recall_oracle_sql(),
    "quantize_embeddings": """
        WITH base AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ), m AS (
          SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) AS maxabs
          FROM base
        )
        SELECT vec_id,
               CAST(CASE WHEN maxabs = 0 THEN 0 ELSE
                 list_sum(list_transform(e, x ->
                   least(greatest(floor(x * 127.0 / maxabs + 0.5),
                                  -127.0), 127.0)))
               END AS BIGINT) AS code_sum,
               round(maxabs / 127.0, 6) AS scale_r
        FROM m
    """,
    "decode_image": """
        SELECT doc_id,
               CAST(1 + doc_id % 5 AS INTEGER) AS height,
               CAST(1 + doc_id % 7 AS INTEGER) AS width,
               CAST(3 AS INTEGER) AS channels,
               CAST(list_sum(list_transform(
                   range(0, 3 * (1 + doc_id % 7) * (1 + doc_id % 5)),
                   i -> (doc_id * 7 + i * 13) % 256)) AS BIGINT) AS pixel_sum
        FROM documents
    """,
    "decode_image_png": """
        SELECT doc_id,
               CAST(1 + doc_id % 5 AS INTEGER) AS height,
               CAST(1 + doc_id % 7 AS INTEGER) AS width,
               CAST(CASE CAST(doc_id % 4 AS INTEGER)
                    WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 4
                    ELSE 3 END AS INTEGER) AS channels,
               CAST(CASE WHEN doc_id % 4 = 3 THEN
                      -- palette: formula stream is indices p; PLTE maps
                      -- (p, c) -> (p*5 + c*11 + 3) % 256
                      list_sum(list_transform(
                        range(0, (1 + doc_id % 7) * (1 + doc_id % 5)),
                        i -> ((((doc_id * 7 + i * 13) % 256) * 5 + 3) % 256)
                           + ((((doc_id * 7 + i * 13) % 256) * 5 + 14) % 256)
                           + ((((doc_id * 7 + i * 13) % 256) * 5 + 25) % 256)))
                    ELSE
                      list_sum(list_transform(
                        range(0, (CASE CAST(doc_id % 4 AS INTEGER)
                                  WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)
                               * (1 + doc_id % 7) * (1 + doc_id % 5)),
                        i -> (doc_id * 7 + i * 13) % 256))
                    END AS BIGINT) AS pixel_sum
        FROM documents
    """,
    "decode_image_gif": """
        SELECT doc_id,
               CAST(2 + doc_id % 6 AS INTEGER) AS height,
               CAST(2 + doc_id % 9 AS INTEGER) AS width,
               CAST(3 AS INTEGER) AS channels,
               CAST(list_sum(list_transform(
                 range(0, (2 + doc_id % 9) * (2 + doc_id % 6)),
                 i -> ((((doc_id * 7 + i * 13) % 256) * 5 + 3) % 256)
                    + ((((doc_id * 7 + i * 13) % 256) * 5 + 14) % 256)
                    + ((((doc_id * 7 + i * 13) % 256) * 5 + 25) % 256)))
                 AS BIGINT) AS pixel_sum
        FROM documents
    """,
    "decode_image_progressive": """
        -- SOF2, DC-only blocks: every pixel of raster block b is
        -- exactly 128 + ((doc_id*7 + b*13) % 101 - 50); doc_id%4=1 is
        -- 4:4:4 color, doc_id%4=3 is 4:2:0 SUBSAMPLED color at
        -- 16-multiple dims (4x the luma blocks) — both neutral-chroma
        -- (R=G=B=Y -> 3x the grayscale sum over the full-res luma
        -- block grid).
        SELECT doc_id,
               CAST((CASE WHEN doc_id % 4 = 3 THEN 16 ELSE 8 END)
                    * (1 + doc_id % 2) AS INTEGER) AS height,
               CAST((CASE WHEN doc_id % 4 = 3 THEN 16 ELSE 8 END)
                    * (1 + doc_id % 3) AS INTEGER) AS width,
               CAST(CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END
                    AS INTEGER) AS channels,
               CAST((CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END)
                    * list_sum(list_transform(
                        range(0, (CASE WHEN doc_id % 4 = 3 THEN 4 ELSE 1 END)
                                 * (1 + doc_id % 3) * (1 + doc_id % 2)),
                        b -> 64 * (128 + (doc_id * 7 + b * 13) % 101 - 50)))
                 AS BIGINT) AS pixel_sum
        FROM documents WHERE doc_id < 200
    """,
    "decode_image_jpeg": """
        -- doc_id % 5 = 1 is 4:2:0 color at 16-multiple dims (4x the
        -- blocks); % 5 = 0 is 4:4:4 color; else grayscale. The per-
        -- block DC formula is shared by all layouts.
        SELECT doc_id,
               CAST((CASE WHEN doc_id % 5 = 1 THEN 16 ELSE 8 END)
                    * (1 + doc_id % 2) AS INTEGER) AS height,
               CAST((CASE WHEN doc_id % 5 = 1 THEN 16 ELSE 8 END)
                    * (1 + doc_id % 3) AS INTEGER) AS width,
               CAST(CASE WHEN doc_id % 5 < 2 THEN 3 ELSE 1 END
                    AS INTEGER) AS channels,
               CAST((CASE WHEN doc_id % 5 < 2 THEN 3 ELSE 1 END)
                    * list_sum(list_transform(
                        range(0, (CASE WHEN doc_id % 5 = 1 THEN 4 ELSE 1 END)
                                 * (1 + doc_id % 3) * (1 + doc_id % 2)),
                        b -> 64 * (128 + (doc_id * 7 + b * 13) % 101 - 50)))
                 AS BIGINT) AS pixel_sum
        FROM documents WHERE doc_id < 300
    """,
    "sample_video_frames": """
        WITH v AS (
          SELECT doc_id,
                 CAST(1 + doc_id % 4 AS INTEGER) AS width,
                 CAST(1 + doc_id % 3 AS INTEGER) AS height,
                 1 + doc_id % 6 AS n_frames
          FROM documents WHERE doc_id < 200
        ), fr AS (
          SELECT doc_id, width, height,
                 unnest(range(0, n_frames)) AS f
          FROM v
        )
        SELECT doc_id,
               CAST(f AS INTEGER) AS frame_index,
               height, width,
               CAST(list_sum(list_transform(range(0, 3 * width * height),
                    i -> (doc_id * 7 + f * 19 + i * 13) % 256)) AS BIGINT)
                 AS frame_pixel_sum
        FROM fr WHERE f % 2 = 0
    """,
    "dedup_exact": """
        SELECT CAST(count(*) AS BIGINT) AS n_unique
        FROM (SELECT DISTINCT text FROM documents)
    """,
    "fingerprint_dedup": """
        SELECT source, CAST(count(DISTINCT trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
            '\\s+', ' ', 'g'))) AS BIGINT) AS n_unique
        FROM documents GROUP BY source
    """,
    "token_stats": """
        SELECT lang,
               CAST(sum(len(list_filter(
                   string_split_regex(trim(text), '\\s+'),
                   x -> x <> ''))) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    """,
    "quality_stats": """
        WITH scored AS (
          SELECT lang,
            len(list_filter(string_split_regex(trim(text), '\\s+'),
                x -> x <> '')) AS n_tokens,
            length(text) AS n_chars,
            length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))
              AS n_punct
          FROM documents
        ), q AS (
          SELECT lang,
            (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
                  THEN 1.0 ELSE 0.3 END) * 0.4
            + (CASE WHEN (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)
                          / CAST(n_chars AS DOUBLE) ELSE 0.0 END) <= 0.3
                    THEN 1.0 ELSE 0.4 END) * 0.3
            + (CASE WHEN n_tokens > 0
                     AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                         >= 2.0
                     AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                         <= 12.0
                    THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
          FROM scored
        )
        SELECT lang,
               CAST(sum(CASE WHEN quality >= 0.99 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_good,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM q GROUP BY lang
    """,
    "language_id": """
        WITH scored AS (
          SELECT lang,
            list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                        x -> x <> '') AS toks,
            (length(text) - length(replace(text, '的', '')))
          + (length(text) - length(replace(text, '是', '')))
          + (length(text) - length(replace(text, '了', '')))
          + (length(text) - length(replace(text, '在', '')))
          + (length(text) - length(replace(text, '和', '')))
          + (length(text) - length(replace(text, '有', '')))
          + (length(text) - length(replace(text, '我', '')))
          + (length(text) - length(replace(text, '不', '')))
          + (length(text) - length(replace(text, '这', '')))
          + (length(text) - length(replace(text, '个', ''))) AS zh
          FROM documents
        ),
        votes AS (
          SELECT lang,
            len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','it','for','was'))) AS en,
            len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','zu','den'))) AS de,
            len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','des','dans','que','pour'))) AS fr,
            len(list_filter(toks, x -> x IN ('el','la','los','las','es','una','del','por','con','para'))) AS es,
            zh
          FROM scored
        ),
        pred AS (
          SELECT lang,
            CASE WHEN greatest(en, de, fr, es, zh) = 0 THEN 'und'
                 WHEN en >= greatest(de, fr, es, zh) THEN 'en'
                 WHEN de >= greatest(fr, es, zh) THEN 'de'
                 WHEN fr >= greatest(es, zh) THEN 'fr'
                 WHEN es >= zh THEN 'es'
                 ELSE 'zh' END AS lang_pred
          FROM votes
        )
        SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2
    """,
    "ngram_jaccard": """
        WITH docs AS (
          SELECT doc_id,
            list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                        x -> x <> '') AS toks
          FROM documents WHERE doc_id < 200
        ),
        grams AS (
          SELECT doc_id,
            list_distinct(
              CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks) - 1),
                   i -> array_to_string(list_slice(toks, i, i + 2), ' '))
              END
            ) AS gs
          FROM docs
        ),
        exploded AS (SELECT doc_id, len(gs) AS n, unnest(gs) AS g FROM grams),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
                 count(*) AS i
          FROM exploded a JOIN exploded b
            ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs
        FROM inter
        WHERE CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) >= 0.35
    """,
    "event_hourly_rollup": """
        SELECT CAST(floor(epoch_ns(ts) / 3600000000000) AS BIGINT) AS hour_id,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "bpe_token_count": """
        SELECT lang,
               CAST(sum(len(regexp_extract_all(text,
                   '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
                 AS total_bpe_tokens
        FROM documents GROUP BY lang
    """,
    "pipeline_compose": """
        WITH scored AS (
          SELECT lang, text,
            len(list_filter(string_split_regex(trim(text), '\\s+'),
                x -> x <> '')) AS n_tokens,
            length(text) AS n_chars,
            length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))
              AS n_punct
          FROM documents
        ), q AS (
          SELECT lang, text, n_tokens,
            (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
                  THEN 1.0 ELSE 0.3 END) * 0.4
            + (CASE WHEN (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)
                          / CAST(n_chars AS DOUBLE) ELSE 0.0 END) <= 0.3
                    THEN 1.0 ELSE 0.4 END) * 0.3
            + (CASE WHEN n_tokens > 0
                     AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                         >= 2.0
                     AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                         <= 12.0
                    THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
          FROM scored
        ), deduped AS (
          SELECT DISTINCT lang, text, n_tokens
          FROM q WHERE quality >= 0.99
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM deduped GROUP BY lang
    """,
    "ann_brute_topk": """
        WITH sims AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(
                     CAST(q.embedding AS DOUBLE[]),
                     CAST(c.embedding AS DOUBLE[])), 6) AS cs
          FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < 50
        ), ranked AS (
          SELECT query_id, neighbor_id,
                 CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cs DESC, neighbor_id) AS INTEGER) AS "rank"
          FROM sims
        )
        SELECT query_id, neighbor_id, "rank" FROM ranked WHERE "rank" <= 3
    """,
    "cosine_dedup": _cosine_dedup_oracle_sql(),
    "byte_histogram_features": """
        WITH per AS (
          SELECT CAST(
              CAST(length(regexp_replace(text, '[^\\x60-\\x6f]', '', 'g'))
                   AS DOUBLE)
              / CAST(greatest(strlen(text), 1) AS DOUBLE) AS REAL) AS f7
          FROM documents)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(CAST(f7 AS DOUBLE)), 3) AS sum_f7
        FROM per
    """,
    "media_metadata": """
        SELECT lang,
               CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    """,
    "repetition_stats": """
        WITH toks AS (
          SELECT lang,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ), g AS (
          SELECT lang,
            CASE WHEN len(tk) >= 2 THEN
              list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
            ELSE []::VARCHAR[] END AS g2,
            CASE WHEN len(tk) >= 3 THEN
              list_transform(range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
            ELSE []::VARCHAR[] END AS g3
          FROM toks
        ), r AS (
          SELECT lang,
            CASE WHEN len(g2) > 0 THEN
              CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
            ELSE 0.0 END AS d2,
            CASE WHEN len(g3) > 0 THEN
              CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
            ELSE 0.0 END AS d3
          FROM g
        )
        SELECT lang, round(sum(d2), 4) AS sum_dup2,
               round(sum(d3), 4) AS sum_dup3,
               CAST(sum(CASE WHEN d2 > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_repetitive,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM r GROUP BY lang
    """,
    "pii_stats": """
        SELECT source,
          CAST(sum(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT)
            AS total_email,
          CAST(sum(len(regexp_extract_all(text,
            'https?://[A-Za-z0-9./_\\-?=&#%]+'))) AS BIGINT) AS total_url,
          CAST(sum(len(regexp_extract_all(text, '[0-9]{9,}'))) AS BIGINT)
            AS total_long_digits,
          CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    """,
    "domain_mix_weights": """
        WITH g AS (
          SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_size
          FROM documents GROUP BY source
        ), s AS (
          SELECT source, total_size,
                 CAST(total_size AS DOUBLE)
                 / CAST((SELECT sum(total_size) FROM g) AS DOUBLE) AS share
          FROM g
        ), p AS (
          SELECT source, total_size, share, pow(share, 0.7) AS pw FROM s
        )
        SELECT source, total_size, round(share, 6) AS share_r,
               round(pw / (SELECT sum(pw) FROM p), 6) AS weight_r
        FROM p
    """,
    "tfidf_top_terms": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     x -> x <> '')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM toks GROUP BY 1, 2
        ), dft AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, term, tf, df_t,
                 tf * (ln(CAST(n_docs + 1 AS DOUBLE)
                          / CAST(df_t + 1 AS DOUBLE)) + 1.0) AS score
          FROM tf JOIN dft USING (term) CROSS JOIN n
        ), ranked AS (
          SELECT doc_id, term, tf, df_t, round(score, 6) AS score_r,
                 CAST(row_number() OVER (
                     PARTITION BY doc_id
                     ORDER BY round(score, 6) DESC, term) AS INTEGER)
                   AS "rank"
          FROM scored
        )
        SELECT doc_id, term, tf, df_t, score_r, "rank"
        FROM ranked WHERE "rank" <= 3 AND doc_id < 100
    """,
    "dedup_clusters": """
        WITH RECURSIVE docs AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents WHERE doc_id < 200
        ), g AS (
          SELECT doc_id,
            list_distinct(
              CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
              ELSE list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(list_slice(tk, i, i + 2), ' '))
              END) AS gs
          FROM docs
        ), ex AS (
          SELECT doc_id, len(gs) AS n, unnest(gs) AS gr FROM g
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
                 count(*) AS i
          FROM ex a JOIN ex b ON a.gr = b.gr AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4
        ), pairs AS (
          SELECT id_a, id_b FROM inter
          WHERE CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) >= 0.35
        ), edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ), reach AS (
          SELECT a AS node, b AS r FROM edges
          UNION
          SELECT reach.node, edges.b
          FROM reach JOIN edges ON reach.r = edges.a
        ), comp AS (
          SELECT node, least(node, min(r)) AS component
          FROM reach GROUP BY node
        )
        SELECT component, CAST(count(*) AS BIGINT) AS n_members
        FROM comp GROUP BY component
    """,
}

# The streaming rollup must equal the batch rollup row-for-row: same
# oracle, with the hour_id derived from the window start (the tumbling
# window floor) instead of the raw ns timestamp.
def _pii_redact_oracle_sql() -> str:
    # Nested regexp_replace in the same dict order pii_redact applies;
    # the default patterns are RE2-compatible so DuckDB replays them.
    expr = "text"
    for name, pat in P.PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<PII:{name}>', 'g')"
    return f"""
        WITH r AS (
          SELECT source, text, {expr} AS red FROM documents
        )
        SELECT source,
               CAST(sum(CASE WHEN red <> text THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_redacted,
               CAST(sum(length(red) - length(text)) AS BIGINT) AS len_delta
        FROM r GROUP BY source
    """


ORACLES["pii_redacted_stats"] = _pii_redact_oracle_sql()
def _minhash_error_oracle_sql(
    num_hashes: int = 32, bands: int = 8, shingle: int = 5, seed: int = 42
) -> str:
    coeffs = D.minhash_coefficients(num_hashes, seed)
    M = (1 << 31) - 1
    mins = ",\n                 ".join(
        f"min(({a} * hm + {b}) % {M}) AS s{p}"
        for p, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_conds = "\n             OR ".join(
        "("
        + " AND ".join(
            f"a.s{b * rpb + j} = b.s{b * rpb + j}" for j in range(rpb)
        )
        + ")"
        for b in range(bands)
    )
    agree = "\n               + ".join(
        f"(CASE WHEN a.s{p} = b.s{p} THEN 1 ELSE 0 END)"
        for p in range(num_hashes)
    )
    return f"""
    WITH ex AS (
      SELECT doc_id,
             unnest(list_transform(
                 range(1, greatest(length(text) - {shingle - 1}, 1) + 1),
                 i -> ('0x' || substr(md5(substr(text, i, {shingle})),
                                      1, 15))::BIGINT % {M}
             )) AS hm
      FROM documents WHERE doc_id < 200
    ),
    sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
    exd AS (SELECT DISTINCT doc_id, hm FROM ex),
    sz AS (SELECT doc_id, count(*) AS n FROM exd GROUP BY doc_id),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST({agree} AS DOUBLE) / {num_hashes} AS est
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_conds})
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM exd a JOIN exd b ON a.hm = b.hm AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT c.id_a, c.id_b, c.est,
             CAST(coalesce(i.i, 0) AS DOUBLE)
               / CAST(sa.n + sb.n - coalesce(i.i, 0) AS DOUBLE) AS ex_jac
      FROM cand c
      LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
      JOIN sz sa ON c.id_a = sa.doc_id
      JOIN sz sb ON c.id_b = sb.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(est), 6) AS avg_estimate,
           round(avg(ex_jac), 6) AS avg_exact,
           round(avg(abs(est - ex_jac)), 6) AS avg_abs_error
    FROM j
    """


def _profile_oracle_sql(cols) -> str:
    parts = [
        f"""SELECT '{c}' AS "column",
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_nulls,
          CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
          round(avg(length(CAST({c} AS VARCHAR))), 6) AS avg_len
        FROM orders"""
        for c in cols
    ]
    return "\n        UNION ALL ".join(parts)


ORACLES["skew_report"] = """
    WITH c AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    t AS (SELECT sum(n_rows) AS tt FROM c),
    top AS (
      SELECT key, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, key ASC) AS rk
      FROM c
    )
    SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
           round(CAST(n_rows AS DOUBLE) / (SELECT tt FROM t), 6) AS share,
           CAST(rk AS INTEGER) AS rank
    FROM top WHERE rk <= 10
"""

ORACLES["ab_test"] = """
    WITH r AS (
      SELECT
        count(CASE WHEN event_type = 'click' THEN value END) AS n_a,
        count(CASE WHEN event_type = 'view' THEN value END) AS n_b,
        avg(CASE WHEN event_type = 'click' THEN value END) AS mean_a,
        avg(CASE WHEN event_type = 'view' THEN value END) AS mean_b,
        stddev_samp(CASE WHEN event_type = 'click' THEN value END) AS sd_a,
        stddev_samp(CASE WHEN event_type = 'view' THEN value END) AS sd_b
      FROM events
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_a - mean_b)
                 / sqrt((sd_a * sd_a) / n_a + (sd_b * sd_b) / n_b), 6)
             AS t_stat
    FROM r
"""

_W7 = 7 * 86400 * 1_000_000
ORACLES["funnel_stats"] = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_type FROM events
    ),
    s1 AS (
      SELECT user_id, min(us) AS t0 FROM e
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us > s1.t0
        AND e.us <= s1.t0 + {_W7}
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.us) AS t3
      FROM e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
      WHERE e.event_type = 'click' AND e.us > s2.t2
        AND e.us <= s1.t0 + {_W7}
      GROUP BY e.user_id
    ),
    users AS (SELECT DISTINCT user_id FROM e),
    per AS (
      SELECT u.user_id,
        CASE WHEN s3.user_id IS NOT NULL THEN 3
             WHEN s2.user_id IS NOT NULL THEN 2
             WHEN s1.user_id IS NOT NULL THEN 1
             ELSE 0 END AS sc
      FROM users u
      LEFT JOIN s1 ON u.user_id = s1.user_id
      LEFT JOIN s2 ON u.user_id = s2.user_id
      LEFT JOIN s3 ON u.user_id = s3.user_id
    )
    SELECT CAST(sc AS INTEGER) AS steps_completed,
           CAST(count(*) AS BIGINT) AS n_users
    FROM per GROUP BY sc
"""

ORACLES["retention_cohorts"] = """
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / (604800.0 * 1000000)) AS BIGINT)
               AS p
      FROM events
    ),
    first AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY user_id)
    SELECT f.cohort AS cohort_period,
           e.p - f.cohort AS period_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active_users
    FROM e JOIN first f USING (user_id)
    GROUP BY 1, 2
"""

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
ORACLES["corr_matrix"] = "\nUNION ALL ".join(
    f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
        round(corr({a}, {b}), 6) AS corr FROM lineitem"""
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1:]
)

ORACLES["numeric_summary"] = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(l_quantity), 6) AS mean,
           round(stddev_samp(l_quantity), 6) AS stddev,
           min(l_quantity) AS "min",
           max(l_quantity) AS "max",
           round(quantile_cont(l_quantity, 0.5), 6) AS p50,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90,
           round(quantile_cont(l_quantity, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
"""

ORACLES["column_profile"] = _profile_oracle_sql(
    ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
)

ORACLES["char_entropy_stats"] = """
    WITH cs AS (
      SELECT lang,
             string_split_regex(text, '') AS c,
             length(text) AS n
      FROM documents WHERE text IS NOT NULL
    ),
    e AS (
      SELECT lang,
        CASE WHEN n = 0 THEN 0.0 ELSE
          round(-list_sum(list_transform(
            list_sort(list_distinct(c)),
            ch -> (CAST(len(list_filter(c, x -> x = ch)) AS DOUBLE) / n)
                  * log2(CAST(len(list_filter(c, x -> x = ch)) AS DOUBLE)
                         / n))), 6)
        END AS h
      FROM cs
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(h), 4) AS avg_entropy,
           round(min(h), 4) AS min_entropy
    FROM e GROUP BY lang
"""

ORACLES["minhash_estimator_error"] = _minhash_error_oracle_sql()

ORACLES["bpe_merges"] = _bpe_oracle_sql()
ORACLES["bpe_tokenized_stats"] = _bpe_oracle_sql(mode="apply")
ORACLES["bpe_fertility"] = _bpe_oracle_sql(mode="fertility")

ORACLES["soft_dedup_weights"] = """
    WITH RECURSIVE docs AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents WHERE doc_id < 200
    ), g AS (
      SELECT doc_id,
        list_distinct(
          CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
          ELSE list_transform(range(1, len(tk) - 1),
               i -> array_to_string(list_slice(tk, i, i + 2), ' '))
          END) AS gs
      FROM docs
    ), ex AS (
      SELECT doc_id, len(gs) AS n, unnest(gs) AS gr FROM g
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS i
      FROM ex a JOIN ex b ON a.gr = b.gr AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      WHERE CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) >= 0.35
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a AS node, b AS r FROM edges
      UNION
      SELECT reach.node, edges.b
      FROM reach JOIN edges ON reach.r = edges.a
    ), comp AS (
      SELECT node, least(node, min(r)) AS component
      FROM reach GROUP BY node
    ), sizes AS (
      SELECT component, count(*) AS n FROM comp GROUP BY component
    ), w AS (
      SELECT c.node AS doc_id, 1.0 / s.n AS wt
      FROM comp c JOIN sizes s USING (component)
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN coalesce(w.wt, 1.0) < 1.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_downweighted,
           round(sum(coalesce(w.wt, 1.0)), 6) AS effective_docs
    FROM docs d LEFT JOIN w USING (doc_id)
    GROUP BY d.lang
"""

ORACLES["recency_sample_stats"] = """
    WITH x AS (
      SELECT event_type, value,
        (epoch(TIMESTAMP '2024-03-01 00:00:00')
         - floor(epoch(ts))) / 86400.0 AS age_days,
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':recency'),
             1, 13)) AS BIGINT) / 4503599627370496.0 AS u
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(sum(value), 4) AS sum_value
    FROM x
    WHERE u < greatest(pow(0.5, age_days / 14.0), 0.01)
    GROUP BY event_type
"""

ORACLES["chunk_vector_topk"] = """
    WITH toked AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '') AS tk
      FROM documents
    ),
    t2 AS (SELECT doc_id, tk, len(tk) AS n FROM toked WHERE len(tk) > 0),
    chunks AS (
      SELECT doc_id, tk, n,
             unnest(generate_series(
               0, 24 * CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT),
               24)) AS cs
      FROM t2
    ),
    c2 AS (
      SELECT doc_id * 100 + cs // 24 AS chunk_id, doc_id,
             tk[cs + 1 : cs + least(32, n - cs)] AS ct
      FROM chunks
    ),
    vec AS (
      SELECT chunk_id, doc_id,
             list_transform(range(0, 16), dd ->
               CAST(len(list_filter(ct, t ->
                 CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 16
                   = dd)) AS DOUBLE)) AS v
      FROM c2
    ),
    cents AS (
      SELECT v AS cemb,
             CAST(row_number() OVER (ORDER BY chunk_id) - 1 AS INTEGER)
               AS cid
      FROM vec
      WHERE chunk_id % 100 = 0
        AND doc_id % (17 * CAST(ceil(sqrt(
              (SELECT count(*) FROM documents) / 500.0)) AS BIGINT)) = 5
    ),
    sim AS (
      SELECT vec.chunk_id, vec.doc_id, c.cid,
             round(list_cosine_similarity(vec.v, c.cemb), 6) AS cs
      FROM vec, cents c
    ),
    ranked_cells AS (
      SELECT chunk_id, doc_id, cid,
             row_number() OVER (PARTITION BY chunk_id
                                ORDER BY cs DESC, cid) AS rn
      FROM sim
    ),
    assign AS (SELECT chunk_id, cid FROM ranked_cells WHERE rn = 1),
    probes AS (
      SELECT chunk_id, cid FROM ranked_cells
      WHERE rn <= 4 AND doc_id % 97 = 0
    ),
    cellcand AS (
      SELECT p.chunk_id AS qid, a.chunk_id AS nid, p.cid,
             round(list_cosine_similarity(q.v, n.v), 6) AS cs
      FROM probes p JOIN assign a
        ON a.cid = p.cid AND a.chunk_id <> p.chunk_id
      JOIN vec q ON q.chunk_id = p.chunk_id
      JOIN vec n ON n.chunk_id = a.chunk_id
    ),
    percell AS (
      SELECT qid, nid, cs,
             row_number() OVER (PARTITION BY qid, cid
                                ORDER BY cs DESC, nid) AS rn
      FROM cellcand
    ),
    scored AS (SELECT DISTINCT qid, nid, cs FROM percell WHERE rn <= 3),
    ranked AS (
      SELECT qid AS query_id, nid AS neighbor_id,
             CAST(row_number() OVER (
                 PARTITION BY qid
                 ORDER BY cs DESC, nid) AS INTEGER) AS "rank"
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank" FROM ranked WHERE "rank" <= 3
"""

ORACLES["rollup_counts"] = """
    SELECT coalesce(lang, '<all>') AS lang,
           coalesce(source, '<all>') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY ROLLUP (lang, source)
"""

ORACLES["cms_token_counts"] = """
    WITH toks AS (
      SELECT unnest(list_filter(
          string_split_regex(trim(lower(text)), '\\s+'),
          x -> x <> '')) AS tok
      FROM documents
    ),
    hashes AS (SELECT unnest([0, 1, 2]) AS d),
    occ AS (
      SELECT tok, d,
             CAST(('0x' || substr(md5(tok || '#' || CAST(d AS VARCHAR)),
                  1, 13)) AS BIGINT) % 256 AS pos
      FROM toks CROSS JOIN hashes
    ),
    sketch AS (SELECT d, pos, count(*) AS cnt FROM occ GROUP BY d, pos),
    cand AS (SELECT DISTINCT tok FROM toks),
    probes AS (
      SELECT tok, d,
             CAST(('0x' || substr(md5(tok || '#' || CAST(d AS VARCHAR)),
                  1, 13)) AS BIGINT) % 256 AS pos
      FROM cand CROSS JOIN hashes
    ),
    est AS (
      SELECT p.tok, min(coalesce(s.cnt, 0)) AS cms_estimate
      FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.pos = s.pos
      GROUP BY p.tok
    ),
    exact AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok)
    SELECT e.tok,
           CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           CAST(x.c AS BIGINT) AS exact_count
    FROM est e JOIN exact x ON e.tok = x.tok
"""



def _zorder_oracle_sql(bits: int = 8) -> str:
    terms = " + ".join(
        f"(((x >> {b}) & 1) * {1 << (2 * b)})"
        f" + (((y >> {b}) & 1) * {1 << (2 * b + 1)})"
        for b in range(bits)
    )
    return f"""
    WITH n AS (
      SELECT o_custkey % 256 AS x,
             CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 256 AS y
      FROM orders
    ),
    z AS (SELECT CAST({terms} AS BIGINT) AS zkey FROM n)
    SELECT (zkey >> 12) AS z_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(zkey) AS BIGINT) AS min_key,
           CAST(max(zkey) AS BIGINT) AS max_key
    FROM z GROUP BY 1
    """


ORACLES["zorder_stats"] = _zorder_oracle_sql(8)

def _dhash_sql(w_expr: str, h_expr: str, seed_expr: str, pred: str) -> str:
    """Per-doc dHash CTE chain (ends with per-doc `dh`): parameterized
    over the synthesized payload's dims/seed formulas and row filter."""
    return f"""
    d AS (
      SELECT doc_id, {w_expr} AS w, {h_expr} AS h, {seed_expr} AS sd
      FROM documents WHERE {pred}
    ),
    b AS (SELECT doc_id, w, h, sd, unnest(range(0, 64)) AS bb FROM d),
    gp AS (
      SELECT doc_id, bb, w, sd,
             ((bb % 8) * w) // 9 AS xi,
             (((bb % 8) + 1) * w) // 9 AS xi1,
             ((bb // 8) * h) // 8 AS yj
      FROM b
    ),
    g AS (
      SELECT doc_id, bb,
        ( ((sd*7 + (3*(yj*w+xi)  )*13) % 256)
        + ((sd*7 + (3*(yj*w+xi)+1)*13) % 256)
        + ((sd*7 + (3*(yj*w+xi)+2)*13) % 256) ) // 3 AS gl,
        ( ((sd*7 + (3*(yj*w+xi1)  )*13) % 256)
        + ((sd*7 + (3*(yj*w+xi1)+1)*13) % 256)
        + ((sd*7 + (3*(yj*w+xi1)+2)*13) % 256) ) // 3 AS gr
      FROM gp
    ),
    dh AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN gl > gr THEN
                        CASE WHEN bb = 63 THEN -9223372036854775808
                             ELSE (CAST(1 AS BIGINT) << bb) END
                      ELSE 0 END) AS BIGINT) AS dhash
      FROM g GROUP BY doc_id
    )"""


ORACLES["dhash_stats"] = (
    "WITH" + _dhash_sql(
        "10 + doc_id % 14", "9 + doc_id % 10", "doc_id", "doc_id < 300"
    )
    + "\n    SELECT doc_id, dhash FROM dh"
)

ORACLES["dhash_dedup"] = (
    "WITH" + _dhash_sql(
        "9 + doc_id % 7", "8 + doc_id % 5", "doc_id % 50", "doc_id < 400"
    )
    + """,
    keep AS (SELECT dhash, min(doc_id) AS doc_id FROM dh GROUP BY dhash)
    SELECT doc.lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(count(DISTINCT k.dhash) AS BIGINT) AS n_hashes
    FROM keep k JOIN documents doc USING (doc_id)
    GROUP BY doc.lang"""
)

ORACLES["bigram_lm_stats"] = """
    WITH toked AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '') AS tk
      FROM documents
    ),
    uni AS (
      SELECT t, count(*) AS c1 FROM (
        SELECT unnest(tk) AS t FROM toked
      ) GROUP BY t
    ),
    tot AS (SELECT sum(c1) AS N FROM uni),
    big AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(tk)),
               i -> {'prev': tk[i], 'cur': tk[i+1]})) AS b
      FROM toked WHERE len(tk) >= 2
    ),
    bg AS (SELECT doc_id, lang, b.prev AS prev, b.cur AS cur FROM big),
    c2 AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY prev, cur),
    doc AS (
      SELECT bg.doc_id, any_value(bg.lang) AS lang,
             round(avg(-ln(
               0.7 * (CAST(c2.c2 AS DOUBLE) / CAST(up.c1 AS DOUBLE))
               -- (1.0 - 0.7), not the literal 0.3: IEEE 1.0-0.7 is
               -- 0.30000000000000004 and the Spark side computes it
               + (1.0 - 0.7) * (CAST(uc.c1 AS DOUBLE)
                        / CAST((SELECT N FROM tot) AS DOUBLE))
             )), 6) AS nll
      FROM bg
      JOIN c2 ON bg.prev = c2.prev AND bg.cur = c2.cur
      JOIN uni up ON bg.prev = up.t
      JOIN uni uc ON bg.cur = uc.t
      GROUP BY bg.doc_id
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(nll), 4) AS avg_nll2
    FROM doc GROUP BY lang
"""

ORACLES["unigram_lm_stats"] = """
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(
                 string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS t
      FROM documents
    ), freqs AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t
    ), tot AS (
      SELECT sum(c) AS N FROM freqs
    ), doc AS (
      SELECT doc_id, any_value(lang) AS lang,
             round(avg(ln((SELECT N FROM tot)) - ln(c)), 6) AS nll
      FROM toks JOIN freqs USING (t)
      GROUP BY doc_id
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(nll), 4) AS avg_nll
    FROM doc GROUP BY lang
"""

# Same component construction as dedup_clusters, then the survivor is
# the per-component argmax on (n_chars DESC, doc_id ASC); docs in no
# pair are singleton components.
ORACLES["cluster_representative_stats"] = """
    WITH RECURSIVE docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents WHERE doc_id < 200
    ), g AS (
      SELECT doc_id,
        list_distinct(
          CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
          ELSE list_transform(range(1, len(tk) - 1),
               i -> array_to_string(list_slice(tk, i, i + 2), ' '))
          END) AS gs
      FROM docs
    ), ex AS (
      SELECT doc_id, len(gs) AS n, unnest(gs) AS gr FROM g
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS i
      FROM ex a JOIN ex b ON a.gr = b.gr AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      WHERE CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) >= 0.35
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a AS node, b AS r FROM edges
      UNION
      SELECT reach.node, edges.b
      FROM reach JOIN edges ON reach.r = edges.a
    ), comp AS (
      SELECT node, least(node, min(r)) AS component
      FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             coalesce(c.component, d.doc_id) AS comp
      FROM (SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 200) d
      LEFT JOIN comp c ON d.doc_id = c.node
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY comp ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM labeled
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM ranked WHERE rk = 1 GROUP BY lang
"""

ORACLES["streaming_enriched_rollup"] = ORACLES_STREAM_ENRICH

ORACLES["url_canon_stats"] = r"""
    WITH u0 AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
        || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
        || 'pages.' || source
        || (CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.org' END)
        || '/p/' || CAST(doc_id % 50 AS VARCHAR)
        || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
        || (CASE WHEN doc_id % 2 = 0
            THEN '?utm_source=x&id=' || CAST(doc_id % 7 AS VARCHAR)
            ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
      FROM documents
    ),
    c AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(
          CASE WHEN s5 NOT LIKE '%?%' AND s5 LIKE '%&%'
               THEN regexp_replace(s5, '^([^&]*)&', '\1?')
               ELSE s5 END,
          '[?&]+$', ''), '/+\?', '?', 'g'), '/+$', '') AS canon
      FROM (
        SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(lower(trim(url)), '#.*$', ''),
                '^https?://', ''),
              '^www\.', ''),
            '[?&]utm_[a-z0-9_]*=[^&]*', '', 'g') AS s5
        FROM u0
      )
    ),
    h AS (
      SELECT doc_id, canon,
             regexp_extract(canon, '^([^/?]+)', 1) AS host
      FROM c
    ),
    d AS (
      SELECT doc_id, canon, host,
             regexp_extract(host, '([a-z0-9-]+\.[a-z]+)$', 1) AS dom
      FROM h
    )
    SELECT dom AS registered_domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
    FROM d GROUP BY dom
"""

ORACLES["event_props_stats"] = """
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing
    FROM x GROUP BY event_type
"""

ORACLES["streaming_interval_join"] = """
    SELECT l.event_id AS left_event, r.event_id AS right_event,
           CAST((epoch_ns(r.ts) - epoch_ns(l.ts)) // 1000 AS BIGINT)
             AS delta_us
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 600 SECOND
    WHERE l.event_id % 2 = 0 AND r.event_id % 2 = 1
"""

ORACLES["streaming_html_ingest"] = r"""
    WITH tn AS (
      SELECT doc_id, lang,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM documents
    ),
    e AS (
      SELECT doc_id, lang,
             'Title & Stats' || chr(10) || t0 || chr(10)
               || 'Copyright ' || chr(169) || ' '
               || CAST(2000 + doc_id % 30 AS VARCHAR) || ' <Corp>'
               || chr(10) || '5 < 6' || chr(10) || 'end' AS t
      FROM tn
    ),
    g AS (
      SELECT lang, t,
        len(list_filter(string_split_regex(trim(t), '\s+'),
            x -> x <> '')) AS nt
      FROM e
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(t)) AS BIGINT) AS sum_extracted_chars
    FROM g WHERE nt >= 50 GROUP BY lang
"""

ORACLES["streaming_hourly_rollup"] = """
    SELECT CAST(floor(epoch_ns(ts) / 3600000000000) AS BIGINT) AS hour_id,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
"""

ORACLES["stratified_sample"] = f"""
    WITH u AS (
      SELECT lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                  AS BIGINT) / 4503599627370496.0 AS u,
             {_rates_case_sql()} AS rate
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM u WHERE u < rate GROUP BY lang
"""

ORACLES["ngram_contamination"] = f"""
    WITH {_GRAMS5_CTE},
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0
    ),
    corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
    ex AS (SELECT doc_id, unnest(gs) AS g FROM corpus),
    m AS (
      SELECT doc_id, count(*) AS matched
      FROM ex JOIN bench USING (g) GROUP BY doc_id
    ),
    per AS (
      SELECT c.doc_id, c.lang,
        CASE WHEN len(c.gs) > 0 THEN
          CAST(coalesce(m.matched, 0) AS DOUBLE) / len(c.gs)
        ELSE 0.0 END AS cont
      FROM corpus c LEFT JOIN m ON c.doc_id = m.doc_id
    )
    SELECT lang,
           CAST(sum(CASE WHEN cont >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           round(sum(cont), 4) AS sum_contamination,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM per GROUP BY lang
"""

def _length_bucket_case_sql() -> str:
    from .pipeline import LENGTH_BUCKET_EDGES

    whens = " ".join(
        f"WHEN n_tokens < {e} THEN {i}"
        for i, e in enumerate(LENGTH_BUCKET_EDGES)
    )
    return f"CASE {whens} ELSE {len(LENGTH_BUCKET_EDGES)} END"


ORACLES["length_bucket_stats"] = f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
             {_length_bucket_case_sql()} AS bucket,
             doc_id % 8 AS shard
      FROM toks
    ),
    r AS (
      SELECT *, CAST(floor((row_number() OVER (
               PARTITION BY shard, bucket ORDER BY doc_id) - 1) / 8)
             AS BIGINT) AS batch_id
      FROM b
    ),
    p AS (
      SELECT *, max(n_tokens) OVER (
               PARTITION BY shard, bucket, batch_id) - n_tokens AS pad
      FROM r
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT [shard, batch_id]) AS BIGINT) AS n_batches,
           CAST(sum(pad) AS BIGINT) AS total_pad,
           CAST(max(n_tokens) AS BIGINT) AS max_len
    FROM p GROUP BY bucket
"""


_BLOOM_POS_SQL = (
    "CAST(('0x' || substr(md5(g || '#' || CAST(i AS VARCHAR)), 1, 13))"
    " AS BIGINT) % 65536"
)

ORACLES["bloom_contamination"] = f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             list_distinct(CASE WHEN len(tk) >= 3 THEN
               list_transform(range(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
             ELSE []::VARCHAR[] END) AS gs
      FROM toks
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0
    ),
    hashes AS (SELECT unnest([0, 1, 2]) AS i),
    bpos AS (
      SELECT DISTINCT {_BLOOM_POS_SQL} AS pos FROM bench CROSS JOIN hashes
    ),
    corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
    ex AS (SELECT doc_id, unnest(gs) AS g FROM corpus),
    cand AS (
      SELECT doc_id, g, i, {_BLOOM_POS_SQL} AS pos
      FROM ex CROSS JOIN hashes
    ),
    hit AS (
      SELECT doc_id, g FROM cand JOIN bpos USING (pos)
      GROUP BY doc_id, g HAVING count(*) = 3
    ),
    fl AS (SELECT doc_id, count(*) AS flagged FROM hit GROUP BY doc_id),
    per AS (
      SELECT c.doc_id, c.lang,
        CASE WHEN len(c.gs) > 0 THEN
          CAST(coalesce(f.flagged, 0) AS DOUBLE) / len(c.gs)
        ELSE 0.0 END AS frac
      FROM corpus c LEFT JOIN fl f ON c.doc_id = f.doc_id
    )
    SELECT lang,
           CAST(sum(CASE WHEN frac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           round(sum(frac), 4) AS sum_fraction,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM per GROUP BY lang
"""

# Temporal operators: DuckDB window functions / ASOF JOIN / inequality
# join reproduce the Spark compositions exactly (integer-microsecond
# arithmetic on the truncated ns->us timestamps both engines share).
ORACLES["sessionize_stats"] = """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    ),
    per AS (
      SELECT user_id, session_id,
             CAST(count(*) AS BIGINT) AS n,
             max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           round(sum(n) * 1.0 / count(*), 6) AS avg_events,
           CAST(max(n) AS BIGINT) AS max_events,
           round(sum(span_us) / (count(*) * 1000000.0), 3) AS avg_span_sec
    FROM per
"""

# The stateful streaming formulation must reproduce the batch windows
# (same corpus subset as the staged stream).
ORACLES["streaming_sessionize_stats"] = ORACLES["sessionize_stats"].replace(
    "FROM events", "FROM events WHERE user_id % 4 = 0", 1
)

ORACLES["asof_join_gap"] = """
    WITH p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.user_id, p.ts, c.cts,
             epoch_us(p.ts) - epoch_us(c.cts) AS gap_us
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts >= c.cts
    )
    SELECT CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(cts) AS BIGINT) AS n_matched,
           round(sum(gap_us) / (count(cts) * 1000000.0), 6) AS avg_gap_sec,
           round(max(gap_us) / 1000000.0, 6) AS max_gap_sec
    FROM j
"""

ORACLES["hll_user_rollup"] = """
    -- Exact distinct count + the accuracy bar the HLL rollup must
    -- meet at ANY scale (sparse cells are exact; dense cells must
    -- stay inside the sketch's published error).
    SELECT event_type,
           epoch_us(ts) // 86400000000 AS day_id,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS within_bound
    FROM events
    GROUP BY 1, 2
"""

ORACLES["normalize_text_stats"] = r"""
    WITH dirty AS (
      SELECT lang,
             chr(8220) || upper(substr(text, 1, 10)) || chr(8221)
               || chr(8212) || chr(7) || ' ' || substr(text, 11)
               || '  ' AS text
      FROM documents
    ),
    norm AS (
      SELECT lang, text,
        trim(regexp_replace(
          lower(
            replace(
              translate(
                regexp_replace(text,
                  '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                chr(8216) || chr(8217) || chr(8218) || chr(8242)
                  || chr(8220) || chr(8221) || chr(8222) || chr(8243)
                  || chr(8211) || chr(8212) || chr(160) || chr(8239)
                  || chr(8201),
                repeat(chr(39), 4) || repeat(chr(34), 4) || '--   '),
              chr(8230), '...')
          ),
          '\s+', ' ', 'g')) AS text_norm
      FROM dirty
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS chars_dirty,
           CAST(sum(length(text_norm)) AS BIGINT) AS chars_norm
    FROM norm
    GROUP BY lang
"""

ORACLES["html_extract_stats"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 7 = 3
    ),
    tn AS (
      -- the doc text round-trips escape->decode exactly, so the
      -- expected body is just the whitespace-normalized text
      SELECT doc_id, lang,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM d
    ),
    e AS (
      SELECT doc_id, lang,
             'Title & Stats' || chr(10) || t0 || chr(10)
               || 'Copyright ' || chr(169) || ' '
               || CAST(2000 + doc_id % 30 AS VARCHAR) || ' <Corp>'
               || chr(10) || '5 < 6' || chr(10) || 'end' AS t
      FROM tn
    )
    SELECT doc_id, lang,
           CAST(length(t) AS INTEGER) AS n_chars,
           md5(t) AS fp
    FROM e
"""

ORACLES["warc_ingest_stats"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 1
    ),
    raw AS (
      -- the RAW page exactly as the query synthesizes it, to replay
      -- the WARC payload byte count (HTTP head + page body)
      SELECT doc_id, lang, text,
        '<html><!-- nav & junk --><head><title>T</title>'
          || '<script type="text/x">if (a<b && c>d) { f("&amp;"); }'
          || '</script><style>p { c: r; }</style></head>'
          || '<body id="b"><h1>Title &amp; Stats</h1><p>'
          || replace(replace(replace(text, '&', '&amp;'),
                             '<', '&lt;'), '>', '&gt;')
          || '</p><div class="foot">Copyright &copy; '
          || CAST(2000 + doc_id % 30 AS VARCHAR)
          || ' &lt;Corp&gt;</div>5 &lt; 6<br/>end</body></html>' AS page
      FROM d
    ),
    sized AS (
      SELECT doc_id, lang, text,
             octet_length(encode(page)) AS body_n
      FROM raw
    ),
    tn AS (
      SELECT doc_id, lang, body_n,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM sized
    ),
    e AS (
      SELECT doc_id, lang, body_n,
             'Title & Stats' || chr(10) || t0 || chr(10)
               || 'Copyright ' || chr(169) || ' '
               || CAST(2000 + doc_id % 30 AS VARCHAR) || ' <Corp>'
               || chr(10) || '5 < 6' || chr(10) || 'end' AS t
      FROM tn
    )
    SELECT doc_id, lang,
           CAST(200 AS INTEGER) AS http_status,
           CAST(octet_length(encode(
                  'HTTP/1.1 200 OK' || chr(13) || chr(10)
                  || 'Content-Type: text/html; charset=utf-8'
                  || chr(13) || chr(10)
                  || 'Content-Length: ' || CAST(body_n AS VARCHAR)
                  || chr(13) || chr(10) || chr(13) || chr(10)
                )) + body_n AS BIGINT) AS payload_bytes,
           CAST(length(t) AS INTEGER) AS n_chars,
           md5(t) AS fp
    FROM e
"""

ORACLES["warc_http_framing_stats"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 0
    ),
    raw AS (
      SELECT doc_id, lang, text,
        '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
          || replace(replace(replace(text, '&', '&amp;'),
                             '<', '&lt;'), '>', '&gt;')
          || '</p></body></html>' AS page,
        CASE CAST(doc_id % 5 AS INTEGER)
          WHEN 0 THEN 'identity' WHEN 1 THEN 'chunked'
          WHEN 2 THEN 'gzip' WHEN 3 THEN 'deflate'
          ELSE 'chunked+gzip' END AS framing
      FROM d
    ),
    sized AS (
      SELECT *, octet_length(encode(page)) AS body_n FROM raw
    ),
    pb AS (
      -- exact on-wire payload bytes where SQL can express them:
      -- identity = head + body; chunked = head + per-chunk overhead
      -- (hex size line + CRLF + CRLF per 1024-byte chunk, terminal
      -- '0' chunk = 5 bytes); compressed framings -> NULL.
      SELECT *,
        CASE WHEN framing = 'identity' THEN
          octet_length(encode('HTTP/1.1 200 OK' || chr(13) || chr(10)
            || 'Content-Type: text/html; charset=utf-8'
            || chr(13) || chr(10)
            || 'Content-Length: ' || CAST(body_n AS VARCHAR)
            || chr(13) || chr(10) || chr(13) || chr(10))) + body_n
        WHEN framing = 'chunked' THEN
          octet_length(encode('HTTP/1.1 200 OK' || chr(13) || chr(10)
            || 'Content-Type: text/html; charset=utf-8'
            || chr(13) || chr(10)
            || 'Transfer-Encoding: chunked'
            || chr(13) || chr(10) || chr(13) || chr(10)))
          + (body_n // 1024) * 1031
          + CASE WHEN body_n % 1024 > 0
                 THEN length(printf('%x', body_n % 1024)) + 4
                      + body_n % 1024
                 ELSE 0 END
          + 5
        END AS framed_bytes
      FROM sized
    ),
    tn AS (
      SELECT doc_id, lang, framing, framed_bytes,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM pb
    ),
    e AS (
      SELECT doc_id, lang, framing, framed_bytes,
             'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || t0 AS t
      FROM tn
    )
    SELECT doc_id, lang, framing,
           CAST(200 AS INTEGER) AS http_status,
           CAST(framed_bytes AS BIGINT) AS framed_bytes,
           CAST(length(t) AS INTEGER) AS n_chars,
           md5(t) AS fp
    FROM e
"""

ORACLES["wet_roundtrip_stats"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text,
             'http://crawl.test/' || lang || '/'
               || CAST(doc_id AS VARCHAR) AS url
      FROM documents WHERE doc_id % 4 = 1
    )
    SELECT doc_id, lang,
           'conversion' AS warc_type,
           '<urn:md5:' || md5('conversion:' || url) || '>' AS record_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           CAST(length(text) AS INTEGER) AS n_chars,
           md5(text) AS fp
    FROM d
"""

ORACLES["wat_roundtrip_stats"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text,
             'http://crawl.test/' || lang || '/'
               || CAST(doc_id AS VARCHAR) AS url
      FROM documents WHERE doc_id % 4 = 2
    ),
    j AS (
      SELECT doc_id, lang, url, length(text) AS n_chars, md5(text) AS fp,
             '{"url":"' || url || '","lang":"' || lang
               || '","n_chars":' || CAST(length(text) AS VARCHAR)
               || ',"fp":"' || md5(text) || '"}' AS meta_json
      FROM d
    )
    SELECT doc_id,
           'metadata' AS warc_type,
           '<urn:md5:' || md5('metadata:' || url) || '>' AS record_id,
           CAST(octet_length(encode(meta_json)) AS BIGINT)
             AS payload_bytes,
           lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           fp,
           TRUE AS url_consistent
    FROM j
"""

ORACLES["streaming_wet_publish"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 4 = 3
    )
    SELECT doc_id, lang,
           'conversion' AS warc_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           CAST(length(text) AS INTEGER) AS n_chars,
           md5(text) AS fp
    FROM d
"""

ORACLES["robots_gate_stats"] = r"""
    -- Independent truth table from the RFC 9309 semantics (NOT a
    -- replay of the parser): for agent 'trainbot', the en domain has
    -- an exact group (Disallow: /no-train) that SUPERSEDES its
    -- blanket * Disallow: / -> only bucket 3 denied; every other
    -- domain is governed by its * group (Disallow: /private,
    -- Allow: /private/ok) -> bucket 1 denied, bucket 2 re-allowed by
    -- the longer prefix.
    WITH d AS (
      SELECT lang, doc_id % 5 AS bucket FROM documents
    ),
    v AS (
      SELECT lang, bucket,
             CASE WHEN lang = 'en' THEN bucket <> 3
                  ELSE bucket <> 1 END AS crawl_allowed
      FROM d
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket, crawl_allowed,
           CAST(count(*) AS BIGINT) AS n
    FROM v GROUP BY 1, 2, 3
"""

ORACLES["language_id_production_holdout"] = r"""
    -- Independent ACCURACY BAR, not a GD replay: the production-shape
    -- model (dim=1024, 8 steps) must grade a perfectly diagonal
    -- holdout confusion — real rows on the diagonal, garbage rows to
    -- 'und'. Holdout = doc_id % 5 = 4; garbage = those with
    -- doc_id % 3 = 0; classes by doc_id % 4.
    WITH h AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'und'
                  ELSE CASE doc_id % 4 WHEN 0 THEN 'de'
                       WHEN 1 THEN 'en' WHEN 2 THEN 'es'
                       ELSE 'fr' END
             END AS lang_true
      FROM documents WHERE doc_id % 5 = 4
    )
    SELECT lang_true, lang_true AS lang_pred,
           CAST(count(*) AS BIGINT) AS n
    FROM h GROUP BY 1
"""

ORACLES["archive_fs_roundtrip_stats"] = r"""
    -- Per-record text survival through the WET write/read round trip
    -- over the aliased (non-file://) scheme: md5 + length of the
    -- original text, straight from the table.
    SELECT doc_id, lang,
           length(text) AS n_chars,
           md5(text) AS fp
    FROM documents WHERE doc_id % 4 = 1
"""

ORACLES["crawl_schedule_stats"] = r"""
    -- Independent truth table for agent 'trainbot'. Non-vowel langs:
    -- the trainbot group exists (delay-only -> empty for gating) so
    -- ALL buckets are allowed and its delay (len(domain)%5+1)
    -- governs. Vowel langs: the * group governs -> bucket 1
    -- (/private/) denied, /private/ok re-allowed, delay 10.
    WITH d AS (
      SELECT lang, lang || '.example' AS domain, doc_id % 5 AS bucket
      FROM documents
    ),
    v AS (
      SELECT lang, domain,
             substr(lang, 1, 1) IN ('a','e','i','o','u') AS vowel,
             bucket
      FROM d
    ),
    a AS (
      SELECT domain, vowel,
             CAST(count(*) FILTER (WHERE NOT vowel OR bucket <> 1)
                  AS BIGINT) AS n_allowed
      FROM v GROUP BY 1, 2
    )
    SELECT domain, n_allowed,
           CASE WHEN vowel THEN 10.0
                ELSE CAST(length(domain) % 5 + 1 AS DOUBLE) END
             AS crawl_delay,
           n_allowed * (CASE WHEN vowel THEN 10.0
                ELSE CAST(length(domain) % 5 + 1 AS DOUBLE) END)
             AS fetch_seconds
    FROM a
"""

ORACLES["crawl_politeness_stats"] = r"""
    -- Independent truth table: agent 'trainbot'. Vowel-first langs
    -- publish only a * group -> delay 10, one sitemap; others add an
    -- exact trainbot group -> its delay (len(domain)%5+1) supersedes
    -- the * delay and a second sitemap exists.
    WITH d AS (
      SELECT DISTINCT lang, lang || '.example' AS domain FROM documents
    )
    SELECT domain,
           CASE WHEN substr(lang, 1, 1) IN ('a','e','i','o','u')
                THEN 10.0
                ELSE CAST(length(domain) % 5 + 1 AS DOUBLE) END
             AS crawl_delay,
           CAST(CASE WHEN substr(lang, 1, 1) IN ('a','e','i','o','u')
                THEN 1 ELSE 2 END AS BIGINT) AS n_sitemaps
    FROM d
"""

ORACLES["robots_wildcard_stats"] = r"""
    -- Independent truth table from the RFC 9309 wildcard semantics
    -- (NOT a regex replay of the parser). Agent 'trainbot' has no
    -- exact group, so the * group governs every domain:
    --   bucket 0  /docs/{id}.pdf      -> denied  (Disallow /*.pdf$,
    --                                   $-anchored, path ends .pdf)
    --   bucket 1  /docs/{id}.html     -> allowed (no rule matches;
    --                                   the $ anchor misses .html)
    --   bucket 2  /private-L/x/{id}   -> denied  (Disallow /private*/
    --                                   with * spanning '-L')
    --   bucket 3  /private-L/ok/{id}  -> allowed (Allow /private*/ok
    --                                   is longer as written: 12>10)
    --   bucket 4  /cgi/fish{id}.php   -> denied  (Disallow
    --                                   /cgi/fish*.php, mid-rule *)
    -- Agent 'emptybot' has a TRAILING EMPTY exact group: per RFC
    -- group selection it exists, supersedes *, and allows all.
    WITH d AS (
      SELECT doc_id % 5 AS bucket FROM documents
    ),
    v AS (
      SELECT 'trainbot' AS agent, bucket,
             bucket IN (1, 3) AS crawl_allowed
      FROM d
      UNION ALL
      SELECT 'emptybot' AS agent, bucket, TRUE AS crawl_allowed
      FROM d
    )
    SELECT agent, CAST(bucket AS BIGINT) AS bucket, crawl_allowed,
           CAST(count(*) AS BIGINT) AS n
    FROM v GROUP BY 1, 2, 3
"""

ORACLES["crawl_funnel_stats"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 2
    ),
    tn AS (
      SELECT doc_id, lang,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM d
    ),
    e AS (
      SELECT doc_id, lang,
             'http://crawl.test/' || lang || '/'
               || CAST(doc_id AS VARCHAR) AS url,
             (doc_id % 11 = 0) AS noindex,
             'Title & Stats' || chr(10) || t0 || chr(10)
               || 'Copyright ' || chr(169) || ' '
               || CAST(2000 + doc_id % 30 AS VARCHAR) || ' <Corp>'
               || chr(10) || '5 < 6' || chr(10) || 'end' AS t
      FROM tn
    ),
    g AS (
      SELECT url, lang, t, noindex,
             len(list_filter(string_split_regex(trim(t), '\s+'),
                 x -> x <> '')) AS nt
      FROM e
    ),
    fl AS (
      SELECT CASE WHEN noindex THEN 1 ELSE 0 END
           + CASE WHEN nt < 50 THEN 2 ELSE 0 END
           + CASE WHEN length(t) > 560 THEN 4 ELSE 0 END
           + CASE WHEN url <> min(url) OVER (PARTITION BY lang, t)
                  THEN 8 ELSE 0 END AS flags,
             CASE WHEN url <> min(url) OVER (PARTITION BY lang, t)
                  THEN min(url) OVER (PARTITION BY lang, t) END
               AS dup_of
      FROM g
    ),
    agg AS (
      SELECT
        sum(CASE WHEN flags % 2 = 1 THEN 1 ELSE 0 END) AS d0,
        sum(CASE WHEN flags % 2 = 0 THEN 1 ELSE 0 END) AS r0,
        sum(CASE WHEN flags % 4 = 2 THEN 1 ELSE 0 END) AS d1,
        sum(CASE WHEN flags % 4 = 0 THEN 1 ELSE 0 END) AS r1,
        sum(CASE WHEN flags % 8 = 4 THEN 1 ELSE 0 END) AS d2,
        sum(CASE WHEN flags % 8 = 0 THEN 1 ELSE 0 END) AS r2,
        sum(CASE WHEN flags % 16 = 8 THEN 1 ELSE 0 END) AS d3,
        sum(CASE WHEN flags % 16 = 0 THEN 1 ELSE 0 END) AS r3,
        count(DISTINCT dup_of) AS nk
      FROM fl
    )
    SELECT CAST(0 AS INTEGER) AS stage, 'noindex' AS stage_name,
           CAST(d0 AS BIGINT) AS n_dropped_here,
           CAST(r0 AS BIGINT) AS n_remaining,
           CAST(0 AS BIGINT) AS n_absorbing_keepers FROM agg
    UNION ALL
    SELECT CAST(1 AS INTEGER), 'token_gate', CAST(d1 AS BIGINT),
           CAST(r1 AS BIGINT), CAST(0 AS BIGINT) FROM agg
    UNION ALL
    SELECT CAST(2 AS INTEGER), 'too_long', CAST(d2 AS BIGINT),
           CAST(r2 AS BIGINT), CAST(0 AS BIGINT) FROM agg
    UNION ALL
    SELECT CAST(3 AS INTEGER), 'exact_dup', CAST(d3 AS BIGINT),
           CAST(r3 AS BIGINT), CAST(nk AS BIGINT) FROM agg
"""

ORACLES["streaming_warc_ingest"] = r"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 1
    ),
    tn AS (
      SELECT doc_id, lang,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM d
    ),
    e AS (
      SELECT doc_id, lang,
             'Title & Stats' || chr(10) || t0 || chr(10)
               || 'Copyright ' || chr(169) || ' '
               || CAST(2000 + doc_id % 30 AS VARCHAR) || ' <Corp>'
               || chr(10) || '5 < 6' || chr(10) || 'end' AS t
      FROM tn
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(length(t)) AS BIGINT) AS sum_extracted_chars
    FROM e GROUP BY lang
"""

ORACLES["c4_line_filter_stats"] = """
    WITH dirty AS (
      SELECT lang,
             text || chr(10) || 'ok bye'
                  || chr(10) || 'javascript needed today ok'
                  || chr(10) || 'buy now { cheap }'
                  || chr(10) || 'this line has five words.' AS t
      FROM documents
    ),
    kept AS (
      SELECT lang,
             list_filter(string_split(t, chr(10)),
               x -> len(list_filter(
                        string_split_regex(trim(x), ' +'),
                        w -> w <> '')) >= 3
                    AND NOT contains(lower(x), 'javascript')
                    AND NOT contains(lower(x), 'lorem ipsum')
                    AND NOT contains(lower(x), '{')) AS l
      FROM dirty
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(l)) AS BIGINT) AS total_kept_lines,
           CAST(sum(length(array_to_string(l, chr(10)))) AS BIGINT)
             AS total_clean_chars
    FROM kept GROUP BY lang
"""

ORACLES["pipeline_provenance_stats"] = r"""
    WITH tn AS (
      SELECT doc_id, lang,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM documents
    ),
    e AS (
      SELECT doc_id, lang,
             'Title & Stats' || chr(10) || t0 || chr(10)
               || 'Copyright ' || chr(169) || ' 2024 <Corp>'
               || chr(10) || '5 < 6' || chr(10) || 'end' AS t
      FROM tn
    ),
    g AS (
      SELECT doc_id, lang, t,
             len(list_filter(string_split_regex(trim(t), '\s+'),
                 x -> x <> '')) AS nt
      FROM e
    ),
    fl AS (
      SELECT doc_id,
             CASE WHEN nt < 50 THEN 1 ELSE 0 END
           + CASE WHEN length(t) > 560 THEN 2 ELSE 0 END
           + CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY lang, t)
                  THEN 4 ELSE 0 END AS flags,
             CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY lang, t)
                  THEN min(doc_id) OVER (PARTITION BY lang, t) END
               AS dup_of
      FROM g
    ),
    agg AS (
      SELECT
        sum(CASE WHEN flags % 2 = 1 THEN 1 ELSE 0 END) AS d0,
        sum(CASE WHEN flags % 2 = 0 THEN 1 ELSE 0 END) AS r0,
        sum(CASE WHEN flags % 4 = 2 THEN 1 ELSE 0 END) AS d1,
        sum(CASE WHEN flags % 4 = 0 THEN 1 ELSE 0 END) AS r1,
        sum(CASE WHEN flags % 8 = 4 THEN 1 ELSE 0 END) AS d2,
        sum(CASE WHEN flags % 8 = 0 THEN 1 ELSE 0 END) AS r2,
        count(DISTINCT dup_of) AS nk
      FROM fl
    )
    SELECT CAST(0 AS INTEGER) AS stage, 'token_gate' AS stage_name,
           CAST(d0 AS BIGINT) AS n_dropped_here,
           CAST(r0 AS BIGINT) AS n_remaining,
           CAST(0 AS BIGINT) AS n_absorbing_keepers FROM agg
    UNION ALL
    SELECT CAST(1 AS INTEGER), 'too_long', CAST(d1 AS BIGINT),
           CAST(r1 AS BIGINT), CAST(0 AS BIGINT) FROM agg
    UNION ALL
    SELECT CAST(2 AS INTEGER), 'exact_dup', CAST(d2 AS BIGINT),
           CAST(r2 AS BIGINT), CAST(nk AS BIGINT) FROM agg
"""

ORACLES["quality_train_stats"] = _quality_train_oracle_sql(steps=3)
ORACLES["quality_holdout_eval"] = _quality_holdout_oracle_sql()
ORACLES["language_train_stats"] = _language_train_oracle_sql()
ORACLES["language_id_confusion"] = _language_confusion_oracle_sql()
ORACLES["language_id_holdout_confusion"] = _language_holdout_oracle_sql()

ORACLES["html_metadata_stats"] = r"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(
             trim(regexp_replace(substr(text, 1, 30), '\s+', ' ', 'g'))
           )) AS BIGINT) AS sum_title_chars,
           CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_canonical,
           CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_noindex,
           CAST(count(*) AS BIGINT) AS n_lang_match
    FROM documents GROUP BY lang
"""

ORACLES["crawl_prep_stats"] = r"""
    WITH tn AS (
      SELECT lang,
        regexp_replace(regexp_replace(regexp_replace(text,
            '\s*\n\s*', chr(10), 'g'),
            '[^\S\n]+', ' ', 'g'),
            '^\s+|\s+$', '', 'g') AS t0
      FROM documents
    ),
    e AS (
      -- extraction output after the line filter: 'ok bye' (2 words),
      -- the javascript marker line, and 'end' (1 word) are dropped
      SELECT lang,
             'Title & Stats' || chr(10) || t0 || chr(10)
               || 'Copyright ' || chr(169) || ' 2024 <Corp>'
               || chr(10) || '5 < 6' AS t
      FROM tn
    ),
    g AS (
      SELECT lang, t,
             len(list_filter(string_split_regex(t, '\s+'),
                 x -> x <> '')) AS nt
      FROM e
    ),
    d AS (SELECT DISTINCT lang, t, nt FROM g WHERE nt >= 50)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(t)) AS BIGINT) AS sum_clean_chars,
           CAST(sum(nt) AS BIGINT) AS sum_tokens,
           CAST(4 * count(*) AS BIGINT) AS sum_kept_lines
    FROM d GROUP BY lang
"""

ORACLES["bm25_topk"] = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (
      SELECT * FROM (VALUES
        ('q1', 'table'), ('q1', 'scan'),
        ('q2', 'hash'), ('q2', 'join'), ('q2', 'spark'),
        ('q3', 'window'), ('q3', 'sort'), ('q3', 'batch')
      ) t(query_id, term)
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln(1 + (stats.n_docs - dfreq.df + 0.5)
                      / (dfreq.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75
                          + 0.75 * dl.dl / stats.avgdl))
             ), 6) AS score
      FROM tf
      JOIN q USING (term)
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""

ORACLES["script_profile_stats"] = r"""
    WITH injected AS (
      SELECT lang,
             text || CASE doc_id % 4
               WHEN 1 THEN ' ' || chr(1055) || chr(1088) || chr(1080)
                 || chr(1074) || chr(1077) || chr(1090) || ' '
                 || chr(1084) || chr(1080) || chr(1088)
               WHEN 2 THEN repeat(chr(20320) || chr(22909) || chr(19990)
                 || chr(30028), 100)
               WHEN 3 THEN ' ' || chr(1605) || chr(1585) || chr(1581)
                 || chr(1576) || chr(1575) || ' 7'
               ELSE '' END AS t
      FROM documents
    ),
    counted AS (
      SELECT lang,
        length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g'))
          AS c_latin,
        length(t) - length(regexp_replace(t,
          '[\x{0400}-\x{04ff}]', '', 'g')) AS c_cyrillic,
        length(t) - length(regexp_replace(t,
          '[\x{3040}-\x{30ff}\x{4e00}-\x{9fff}\x{ac00}-\x{d7af}]',
          '', 'g')) AS c_cjk,
        length(t) - length(regexp_replace(t,
          '[\x{0600}-\x{06ff}]', '', 'g')) AS c_arabic,
        length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
          AS c_digit,
        length(regexp_replace(t,
          '[A-Za-z\x{0400}-\x{04ff}\x{3040}-\x{30ff}'
          || '\x{4e00}-\x{9fff}\x{ac00}-\x{d7af}\x{0600}-\x{06ff}0-9]',
          '', 'g'))
          - (length(t) - length(regexp_replace(t, '\s', '', 'g')))
          AS c_other
      FROM injected
    ),
    named AS (
      -- argmax with the operator's class order (strict > to replace,
      -- ties keep the earlier class); the corpus is Latin-bodied, so
      -- only the heavy CJK injection can overtake Latin here
      SELECT *, CASE WHEN c_cjk > c_latin THEN 'cjk'
                     WHEN c_latin > 0 THEN 'latin'
                     ELSE 'none' END AS script_main
      FROM counted
    )
    SELECT lang, script_main,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(c_latin) AS BIGINT) AS sum_latin,
           CAST(sum(c_cyrillic) AS BIGINT) AS sum_cyrillic,
           CAST(sum(c_cjk) AS BIGINT) AS sum_cjk,
           CAST(sum(c_arabic) AS BIGINT) AS sum_arabic,
           CAST(sum(c_digit) AS BIGINT) AS sum_digit,
           CAST(sum(c_other) AS BIGINT) AS sum_other
    FROM named GROUP BY lang, script_main
"""

ORACLES["sentence_stats"] = r"""
    WITH spliced AS (
      SELECT lang,
             substr(text, 1, 50) || '. ' || substr(text, 51, 70)
               || '! ' || substr(text, 121) AS t
      FROM documents
    ),
    sent AS (
      SELECT lang,
             list_filter(
               string_split(
                 regexp_replace(
                   regexp_replace(trim(t), chr(30), '', 'g'),
                   '([.!?])\s+', '\1' || chr(30), 'g'),
                 chr(30)),
               s -> trim(s) <> '') AS ss
      FROM spliced
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(ss)) AS BIGINT) AS total_sentences,
           CAST(sum(length(ss[1])) AS BIGINT) AS sum_first_len,
           CAST(sum(CASE WHEN len(ss) >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_three_plus
    FROM sent GROUP BY lang
"""

ORACLES["interval_overlap_count"] = """
    WITH v AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
      FROM events WHERE event_type = 'view'
    ),
    b AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT least(v.e, b.e) - greatest(v.s, b.s) AS ov
      FROM v JOIN b ON v.user_id = b.user_id
       AND v.s <= b.e AND b.s <= v.e
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ov) // 1000000 AS BIGINT) AS overlap_sec
    FROM j
"""

ORACLES["range_join_count"] = """
    WITH p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, ts FROM events WHERE event_type = 'error'
    ),
    j AS (
      SELECT epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
      FROM p JOIN e
        ON p.user_id = e.user_id
       AND epoch_us(e.ts) - epoch_us(p.ts) BETWEEN 0 AND 86400000000
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(gap_us) / (count(*) * 1000000.0), 6) AS avg_gap_sec
    FROM j
"""

# Sequence packing / chunking: DuckDB window functions and
# generate_series reproduce the integer span math exactly (same
# whitespace token count formula as the token_stats oracle).
ORACLES["pack_sequences_stats"] = """
    WITH toks AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    laid AS (
      SELECT shard, n_tokens,
             COALESCE(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS start_offset
      FROM toks
    ),
    flagged AS (
      SELECT shard, n_tokens, start_offset,
             CASE WHEN n_tokens > 0
                  AND (start_offset + n_tokens - 1) // 512
                      > start_offset // 512
                  THEN 1 ELSE 0 END AS spans
      FROM laid
    ),
    per_shard AS (
      SELECT shard,
             CAST(ceil(max(start_offset + n_tokens) / 512.0) AS BIGINT)
               AS n_seqs,
             sum(n_tokens) AS shard_tokens,
             count(*) AS n_docs,
             sum(spans) AS spanning
      FROM flagged GROUP BY shard
    )
    SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(n_seqs) AS BIGINT) AS n_sequences,
           CAST(sum(spanning) AS BIGINT) AS spanning_docs,
           round(sum(shard_tokens) / (sum(n_seqs) * 512.0), 6)
             AS fill_ratio
    FROM per_shard
"""

ORACLES["sliding_chunk_stats"] = """
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(
               0,
               24 * (CAST(ceil(greatest(n_tokens - 32, 0) / 24.0)
                     AS BIGINT)),
               24
             )) AS chunk_start
      FROM toks WHERE n_tokens > 0
    ),
    spans AS (
      SELECT doc_id,
             least(32, n_tokens - chunk_start) AS chunk_len
      FROM chunks
    )
    SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_chunked,
           CAST(count(*) AS BIGINT) AS total_chunks,
           CAST(sum(CASE WHEN chunk_len = 32 THEN 1 ELSE 0 END)
                AS BIGINT) AS full_chunks,
           round(avg(chunk_len), 6) AS avg_chunk_len
    FROM spans
"""


def _kmeans_ctes(
    k: int, n_iter: int, keep_v: bool = False, base_sql: str = None
) -> list:
    """Shared unrolled DuckDB replay of kmeans_fit_predict (same
    seeding, float64 math, smaller-cid tie-break, empty-cluster
    carry-forward), ending at ``afin(vec_id, label, cid, dist)`` —
    plus ``v`` when ``keep_v`` (the semantic-dedup oracle needs the
    vectors for its within-cluster cosine pass). ``base_sql`` overrides
    the default base relation (must yield ``vec_id, v DOUBLE[], label``)."""
    ctes = [
        "base AS ("
        + (
            base_sql
            or "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label"
            " FROM embeddings"
        )
        + ")",
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1"
        f" AS BIGINT) AS cid, v AS c FROM (SELECT vec_id, v FROM base"
        f" ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(n_iter):
        ctes.append(
            f"a{i} AS (SELECT e.vec_id, e.v, e.label,"
            " CAST(min([list_distance(e.v, c.c), CAST(c.cid AS DOUBLE)])[2]"
            f" AS BIGINT) AS cid FROM base e CROSS JOIN c{i} c"
            " GROUP BY e.vec_id, e.v, e.label)"
        )
        ctes.append(
            f"m{i} AS (SELECT cid, array_agg(a ORDER BY ord) AS c FROM ("
            "SELECT cid, ord, avg(val) AS a FROM ("
            "SELECT cid, generate_subscripts(v, 1) AS ord, unnest(v) AS val"
            f" FROM a{i}) GROUP BY cid, ord) GROUP BY cid)"
        )
        ctes.append(
            f"c{i + 1} AS (SELECT cid, c FROM m{i} UNION ALL"
            f" SELECT cid, c FROM c{i}"
            f" WHERE cid NOT IN (SELECT cid FROM m{i}))"
        )
    keep = " e.v," if keep_v else ""
    ctes.append(
        f"afin AS (SELECT e.vec_id, e.label,{keep}"
        " CAST(min([list_distance(e.v, c.c), CAST(c.cid AS DOUBLE)])[2]"
        " AS BIGINT) AS cid,"
        " min(list_distance(e.v, c.c)) AS dist"
        f" FROM base e CROSS JOIN c{n_iter} c"
        " GROUP BY e.vec_id, e.v, e.label)"
    )
    return ctes


def _kmeans_oracle_sql(k: int = 4, n_iter: int = 3) -> str:
    """Per-cluster size / majority-label / mean-distance stats on the
    shared k-means replay (see _kmeans_ctes)."""
    ctes = _kmeans_ctes(k, n_iter)
    ctes.append(
        "per AS (SELECT cid, label, count(*) AS n FROM afin"
        " GROUP BY cid, label)"
    )
    ctes.append(
        "maj AS (SELECT cid, CAST(label AS BIGINT) AS majority_label FROM ("
        "SELECT cid, label, row_number() OVER (PARTITION BY cid"
        " ORDER BY n DESC, label ASC) AS rk FROM per) WHERE rk = 1)"
    )
    ctes.append(
        "stats AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_points,"
        " round(avg(dist), 3) AS avg_dist FROM afin GROUP BY cid)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT s.cid AS cluster, s.n_points, m.majority_label,"
        " s.avg_dist FROM stats s JOIN maj m ON s.cid = m.cid"
    )


ORACLES["incremental_embedding_dedup"] = _incr_emb_dedup_oracle_sql()

ORACLES["kmeans_cluster_stats"] = _kmeans_oracle_sql(4, 3)


def _semantic_dedup_oracle_sql(
    k: int = 4,
    n_iter: int = 2,
    threshold: float = 0.9,
    tables: int = 3,
    dim: int = 64,
    target: int = 128,
) -> str:
    """SemDeDup replay: the shared k-means CTEs (with vectors kept) over
    the duplicate-injected base, the LSH bucket assignment (auto bit
    width from count(*), LCG Rademacher planes — same formulas as the
    cosine_dedup oracle), then drop rows with a smaller-id SAME-CLUSTER
    neighbor sharing a bucket in any table at round(cosine, 6) >=
    threshold — the same EXISTS predicate the lsh kernel evaluates."""
    from .similarity import _LCG_A, _LCG_C, _LCG_M

    half = _LCG_M // 2
    base = (
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label"
        " FROM embeddings UNION ALL"
        " SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]), label"
        " FROM embeddings WHERE vec_id % 5 = 0"
    )
    ctes = _kmeans_ctes(k, n_iter, keep_v=True, base_sql=base)
    ctes.append(
        f"nb AS (SELECT greatest(4, least(24,"
        f" CAST(ceil(log2(count(*) / {float(target)})) AS INT))) AS bits"
        " FROM afin)"
    )
    ctes.append(
        "grid AS (SELECT t.t, b.b, d.d,"
        f" CASE WHEN (((({_LCG_A} * (t.t * 100003 + b.b * 641"
        f" + (d.d - 1)) + {_LCG_C}) % {_LCG_M})"
        f" * (({_LCG_A} * (t.t * 100003 + b.b * 641"
        f" + (d.d - 1)) + {_LCG_C}) % {_LCG_M}))"
        f" // 32768) % {_LCG_M} >= {half} THEN 1 ELSE -1 END AS sgn"
        f" FROM (SELECT unnest(generate_series(0, {tables - 1})) AS t) t,"
        " (SELECT unnest(generate_series(0,"
        " (SELECT bits FROM nb) - 1)) AS b) b,"
        f" (SELECT unnest(generate_series(1, {dim})) AS d) d)"
    )
    ctes.append(
        "dots AS (SELECT a.vec_id, g.t, g.b,"
        " sum(a.v[g.d] * g.sgn) AS dot"
        " FROM afin a, grid g GROUP BY 1, 2, 3)"
    )
    ctes.append(
        "bkts AS (SELECT vec_id, t,"
        " sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << b"
        " ELSE 0 END) AS bkt FROM dots GROUP BY 1, 2)"
    )
    ctes.append(
        "dropped AS (SELECT DISTINCT b.vec_id FROM afin a"
        " JOIN afin b ON a.cid = b.cid AND a.vec_id < b.vec_id"
        " JOIN bkts ba ON ba.vec_id = a.vec_id"
        " JOIN bkts bb ON bb.vec_id = b.vec_id"
        " AND bb.t = ba.t AND bb.bkt = ba.bkt"
        f" WHERE round(list_cosine_similarity(a.v, b.v), 6)"
        f" >= {threshold})"
    )
    ctes.append(
        "kept AS (SELECT * FROM afin WHERE vec_id NOT IN"
        " (SELECT vec_id FROM dropped))"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n_kept,"
        " CAST(min(vec_id) AS BIGINT) AS min_kept_id,"
        " CAST(max(vec_id) AS BIGINT) AS max_kept_id"
        " FROM kept GROUP BY cid"
    )


ORACLES["semantic_dedup_stats"] = _semantic_dedup_oracle_sql(4, 2, 0.9)

def _mix_weights_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in MIX_WEIGHTS.items()
    )
    return f"CASE source {whens} ELSE 0.0 END"


ORACLES["mix_budget_stats"] = f"""
    WITH totals AS (
      SELECT source, sum(n_chars) AS tok FROM documents GROUP BY 1
    ),
    rates AS (
      SELECT source,
             least(1.0, ({float(MIX_BUDGET)} * ({_mix_weights_case_sql()}))
                        / CAST(tok AS DOUBLE)) AS rate
      FROM totals
    ),
    kept AS (
      SELECT d.source, d.n_chars
      FROM documents d JOIN rates r USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                 AS BIGINT) / 4503599627370496.0 < r.rate
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM kept GROUP BY source
"""

ORACLES["quality_logit_stats"] = """
    WITH feats AS (
      SELECT lang,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            x -> x <> '')) AS n_tokens,
        length(text) AS n_chars,
        length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))
          AS n_punct
      FROM documents
    ), scored AS (
      SELECT lang,
        (-1.0
         + 2.5 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)
         + 1.5 * (least(CASE WHEN n_tokens > 0
                        THEN CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                        ELSE 0.0 END, 10.0) / 10.0)
         + (-4.0) * (CASE WHEN n_chars > 0
                     THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
                     ELSE 0.0 END)
        ) AS logit
      FROM feats
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep,
           round(min(logit), 6) AS min_logit,
           round(max(logit), 6) AS max_logit
    FROM scored GROUP BY lang
"""

def _split_oracle_sql() -> str:
    # Replay the exact cumulative float thresholds split_dataset builds
    # (inlined via repr so both engines compare against identical
    # doubles).
    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    total, whens = 0.0, []
    for name, frac in fracs.items():
        lo, total = total, total + float(frac)
        whens.append(
            f"WHEN u >= {lo!r} AND u < {total!r} THEN '{name}'"
        )
    case = "CASE " + " ".join(whens) + " ELSE NULL END"
    return f"""
        WITH u AS (
          SELECT n_chars,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                          || ':split'), 1, 13))
                      AS BIGINT) / 4503599627370496.0 AS u
          FROM documents
        )
        SELECT {case} AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM u GROUP BY 1
    """


ORACLES["dataset_split_stats"] = _split_oracle_sql()


def _prep_pipeline_oracle_sql() -> str:
    # Chain the proven stage replays: logit filter -> 8-token span
    # dedup -> md5-rank cap (15/source) -> cumulative-threshold split.
    t_train = 0.0 + 0.9
    t_val = t_train + 0.1
    return f"""
    WITH feats AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            x -> x <> '')) AS n_tokens,
        length(text) AS n_chars,
        length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
          AS n_punct
      FROM documents
    ), keep0 AS (
      SELECT doc_id FROM feats
      WHERE (-1.0
         + 2.5 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)
         + 1.5 * (least(CASE WHEN n_tokens > 0
                        THEN CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                        ELSE 0.0 END, 10.0) / 10.0)
         + (-4.0) * (CASE WHEN n_chars > 0
                     THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
                     ELSE 0.0 END)) > 0
    ),
    ktoks AS (
      SELECT d.doc_id, d.source,
             list_filter(string_split_regex(trim(d.text), '\\s+'),
                 x -> x <> '') AS tk
      FROM documents d JOIN keep0 USING (doc_id)
    ),
    segs AS (
      SELECT doc_id, source,
             CASE WHEN len(tk) > 0 THEN
               list_transform(range(0, CAST(ceil(len(tk)/8.0) AS INT)),
                 i -> array_to_string(tk[(i*8+1):(i*8+8)], ' '))
             ELSE []::VARCHAR[] END AS sg
      FROM ktoks
    ),
    ex AS (
      SELECT doc_id, generate_subscripts(sg, 1) AS pos, unnest(sg) AS seg
      FROM segs
    ),
    firsts AS (
      SELECT doc_id, seg, pos,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
      FROM ex
    ),
    re AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text_dedup
      FROM firsts WHERE rn = 1 GROUP BY doc_id
    ),
    nonempty AS (
      SELECT s.doc_id, s.source, r.text_dedup
      FROM segs s JOIN re r USING (doc_id)
      WHERE length(r.text_dedup) > 0
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM nonempty
    ),
    capped AS (SELECT * FROM ranked WHERE rk <= 15),
    split AS (
      SELECT CASE
               WHEN u >= 0.0 AND u < {t_train!r} THEN 'train'
               WHEN u >= {t_train!r} AND u < {t_val!r} THEN 'val'
               ELSE NULL END AS split,
             length(text_dedup) AS chars
      FROM (
        SELECT text_dedup,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || ':split'), 1, 13))
                    AS BIGINT) / 4503599627370496.0 AS u
        FROM capped
      )
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS sum_chars
    FROM split GROUP BY 1
    """


ORACLES["prep_pipeline_stats"] = _prep_pipeline_oracle_sql()

ORACLES["top_ngrams"] = """
    WITH toks AS (
      SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT unnest(CASE WHEN len(tk) >= 5 THEN
               list_transform(range(0, len(tk) - 4),
                 i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                      || ' ' || tk[i+4] || ' ' || tk[i+5])
             ELSE []::VARCHAR[] END) AS ngram
      FROM toks
    ),
    counts AS (
      SELECT ngram, CAST(count(*) AS BIGINT) AS count
      FROM grams GROUP BY 1
    )
    SELECT ngram, count,
           CAST(row_number() OVER (ORDER BY count DESC, ngram) AS INTEGER)
             AS rank
    FROM counts ORDER BY count DESC, ngram LIMIT 15
"""

ORACLES["decode_audio"] = """
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
           CAST(50 + doc_id % 40 AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(
               range(0, 50 + doc_id % 40),
               i -> abs(((doc_id * 31 + i * 17) % 65536) - 32768)))
             AS BIGINT) AS sum_abs,
           CAST(list_max(list_transform(
               range(0, 50 + doc_id % 40),
               i -> abs(((doc_id * 31 + i * 17) % 65536) - 32768)))
             AS BIGINT) AS peak
    FROM documents
"""

_GOPHER_FLAGS_CTES = """
    WITH t AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang,
        len(tk) AS nw,
        CASE WHEN len(tk) > 0 THEN
          CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
            / len(tk)
        ELSE 0.0 END AS mwl,
        CASE WHEN len(tk) > 0 THEN
          CAST((length(text) - length(replace(text, '#', '')))
               + (len(string_split(text, '...')) - 1)
               + (len(string_split(text, '…')) - 1) AS DOUBLE) / len(tk)
        ELSE 0.0 END AS symr,
        CASE WHEN len(tk) > 0 THEN
          CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
               AS DOUBLE) / len(tk)
        ELSE 0.0 END AS alphar,
        len(list_distinct(list_filter(
          list_transform(tk, x -> lower(x)),
          x -> list_contains(
            ['the','be','to','of','and','that','have','with'], x)
        ))) AS stops,
        len(string_split(text, chr(10))) AS nl,
        len(list_filter(string_split(text, chr(10)),
            l -> regexp_matches(l, '^\\s*[-*•]'))) AS bl,
        len(list_filter(string_split(text, chr(10)),
            l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS el
      FROM t
    ),
    fl AS (
      SELECT doc_id, lang,
        (nw >= 50 AND nw <= 100000) AS wc_ok,
        (mwl >= 3.0 AND mwl <= 10.0) AS mwl_ok,
        (symr <= 0.1) AS sym_ok,
        (alphar >= 0.8) AS alpha_ok,
        (stops >= 2) AS stop_ok,
        (CAST(bl AS DOUBLE) <= 0.9 * nl) AS bullet_ok,
        (CAST(el AS DOUBLE) <= 0.3 * nl) AS ell_ok
      FROM m
    )
"""

ORACLES["gopher_flags"] = _GOPHER_FLAGS_CTES + """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN wc_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_wc_ok,
           CAST(sum(CASE WHEN mwl_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mwl_ok,
           CAST(sum(CASE WHEN sym_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sym_ok,
           CAST(sum(CASE WHEN alpha_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alpha_ok,
           CAST(sum(CASE WHEN stop_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stop_ok,
           CAST(sum(CASE WHEN wc_ok AND mwl_ok AND sym_ok AND alpha_ok
                         AND stop_ok AND bullet_ok AND ell_ok
                    THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass
    FROM fl GROUP BY lang
"""

ORACLES["gopher_prep_pipeline"] = _GOPHER_FLAGS_CTES + """
    , passing AS (
      SELECT d.lang, d.text FROM fl f JOIN documents d USING (doc_id)
      WHERE f.wc_ok AND f.mwl_ok AND f.sym_ok AND f.alpha_ok
    ),
    dedup AS (SELECT DISTINCT lang, text FROM passing)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(
               string_split_regex(trim(text), '\\s+'), x -> x <> '')))
             AS BIGINT) AS total_tokens
    FROM dedup GROUP BY lang
"""

ORACLES["external_codec_decode"] = """
    WITH px AS (
      SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS fmt,
        (4 + doc_id % 3) AS w, (3 + doc_id % 2) AS h,
        CASE WHEN doc_id % 3 = 1 THEN
          list_sum(list_transform(
            range(0, (4 + doc_id % 3) * (3 + doc_id % 2)),
            i -> ((((doc_id * 7 + i * 13) % 256) * 5 + 3) % 256)
               + ((((doc_id * 7 + i * 13) % 256) * 5 + 14) % 256)
               + ((((doc_id * 7 + i * 13) % 256) * 5 + 25) % 256)))
        ELSE
          list_sum(list_transform(
            range(0, 3 * (4 + doc_id % 3) * (3 + doc_id % 2)),
            i -> (doc_id * 7 + i * 13) % 256))
        END AS pixel_sum
      FROM documents
    )
    SELECT fmt,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(pixel_sum) AS BIGINT) AS n_decoded,
           CAST(sum(pixel_sum) AS BIGINT) AS sum_pixels,
           CAST(sum(3 * w * h) AS BIGINT) AS sum_samples
    FROM px GROUP BY fmt
"""

ORACLES["mixed_media_pipeline"] = _GOPHER_FLAGS_CTES + """
    , px AS (
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 1 THEN
          list_sum(list_transform(
            range(0, (4 + doc_id % 3) * (3 + doc_id % 2)),
            i -> ((((doc_id * 7 + i * 13) % 256) * 5 + 3) % 256)
               + ((((doc_id * 7 + i * 13) % 256) * 5 + 14) % 256)
               + ((((doc_id * 7 + i * 13) % 256) * 5 + 25) % 256)))
        ELSE
          list_sum(list_transform(
            range(0, 3 * (4 + doc_id % 3) * (3 + doc_id % 2)),
            i -> (doc_id * 7 + i * 13) % 256))
        END AS pixel_sum
      FROM documents
    )
    SELECT f.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p.pixel_sum IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_decoded,
           CAST(sum(p.pixel_sum) AS BIGINT) AS sum_pixels,
           CAST(sum(CASE WHEN f.wc_ok AND f.mwl_ok AND f.sym_ok
                          AND f.alpha_ok AND f.stop_ok AND f.bullet_ok
                          AND f.ell_ok AND p.pixel_sum > 1000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_both
    FROM fl f JOIN px p USING (doc_id)
    GROUP BY f.lang
"""


ORACLES["hashed_vector_stats"] = """
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv
      FROM toks
    ),
    slots AS (
      SELECT doc_id, lang, hv % 32 AS slot,
             1 - 2 * ((hv // 32) % 2) AS sgn
      FROM h
    ),
    per AS (
      SELECT doc_id, lang, slot, sum(sgn) AS v
      FROM slots GROUP BY doc_id, lang, slot
    ),
    norms AS (
      SELECT doc_id, lang, sum(v * v) AS sq,
             sum(CASE WHEN slot = 0 THEN v ELSE 0 END) AS v0,
             sum(CASE WHEN slot = 31 THEN v ELSE 0 END) AS v31
      FROM per GROUP BY doc_id, lang
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(n.sq, 0)) AS BIGINT) AS sum_sq_norm,
           CAST(sum(coalesce(n.v0, 0)) AS BIGINT) AS sum_slot0,
           CAST(sum(coalesce(n.v31, 0)) AS BIGINT) AS sum_slot31
    FROM documents d LEFT JOIN norms n USING (doc_id)
    GROUP BY d.lang
"""

ORACLES["dataset_card"] = """
    WITH per AS (
      SELECT lang,
        -- tokens
        CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
             x -> x <> '')) AS BIGINT) AS n_tokens,
        -- char entropy (sorted accumulation, rounded per doc)
        CASE WHEN length(text) = 0 THEN 0.0 ELSE
          round(-list_sum(list_transform(
            list_sort(list_distinct(string_split_regex(text, ''))),
            ch -> (CAST(len(list_filter(string_split_regex(text, ''),
                        x -> x = ch)) AS DOUBLE) / length(text))
                  * log2(CAST(len(list_filter(string_split_regex(text, ''),
                        x -> x = ch)) AS DOUBLE) / length(text)))), 6)
        END AS h,
        -- bigram repetition ratio
        (SELECT CASE WHEN len(g2) > 0 THEN
            CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
          ELSE 0.0 END
         FROM (SELECT CASE WHEN len(tk) >= 2 THEN
                 list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1])
               ELSE []::VARCHAR[] END AS g2
               FROM (SELECT list_filter(
                       string_split_regex(trim(text), '\\s+'),
                       x -> x <> '') AS tk))
        ) AS d2
      FROM documents WHERE text IS NOT NULL
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(h), 4) AS avg_entropy,
           round(sum(d2), 4) AS sum_dup2
    FROM per GROUP BY lang
"""

ORACLES["ngram_novelty"] = """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
        list_distinct(CASE WHEN len(tk) >= 3 THEN
          list_transform(range(1, len(tk) - 1),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        ELSE []::VARCHAR[] END) AS gs
      FROM toks
    ),
    ex AS (SELECT doc_id, lang, unnest(gs) AS gr FROM g),
    firstd AS (SELECT gr, min(doc_id) AS first_doc FROM ex GROUP BY gr),
    per AS (
      SELECT e.doc_id, e.lang,
             count(*) AS n_grams,
             sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
               AS n_novel
      FROM ex e JOIN firstd f USING (gr)
      GROUP BY e.doc_id, e.lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_novel) AS BIGINT) AS total_novel,
           round(CAST(sum(n_novel) AS DOUBLE) / sum(n_grams), 6)
             AS novelty_ratio
    FROM per GROUP BY lang
"""

ORACLES["heaps_law_stats"] = """
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(
                 string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS tok
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
           round(CAST(count(DISTINCT tok) AS DOUBLE) / count(*), 6)
             AS type_token_ratio
    FROM toks GROUP BY lang
"""

ORACLES["zipf_slope"] = """
    WITH toks AS (
      SELECT unnest(list_filter(
                 string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tok ASC)
                AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM freq
    ),
    agg AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_types,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
             AS zipf_slope
    FROM agg
"""

ORACLES["doc_length_summary"] = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(n_chars), 6) AS mean,
           round(stddev_samp(n_chars), 6) AS stddev,
           min(n_chars) AS "min",
           max(n_chars) AS "max",
           round(quantile_cont(n_chars, 0.5), 6) AS p50,
           round(quantile_cont(n_chars, 0.9), 6) AS p90,
           round(quantile_cont(n_chars, 0.99), 6) AS p99
    FROM documents GROUP BY lang
"""

ORACLES["event_anomaly_zscores"] = """
    WITH hourly AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS hour_id,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd,
             count(*) AS n_hours
      FROM hourly GROUP BY 1
    ),
    z AS (
      SELECT h.event_type, st.n_hours,
             round((h.n - st.mu) / st.sd, 4) AS z
      FROM hourly h JOIN st USING (event_type)
    )
    SELECT event_type,
           CAST(max(n_hours) AS BIGINT) AS n_hours,
           round(max(abs(z)), 4) AS max_abs_z,
           CAST(sum(CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalous_hours
    FROM z GROUP BY event_type
"""

ORACLES["winnow_contamination"] = """
    WITH hs AS (
      SELECT doc_id, lang,
             list_transform(range(1, greatest(len(text) - 4, 0) + 1),
               i -> CAST(('0x' || substr(md5(text[i : i + 4]), 1, 15))
                    AS BIGINT)) AS h
      FROM documents
    ),
    fp AS (
      SELECT doc_id, lang,
        CASE WHEN len(h) >= 4 THEN
          list_distinct(list_transform(range(1, len(h) - 2),
            i -> list_min(h[i : i + 3])))
        ELSE []::BIGINT[] END AS fps
      FROM hs
    ),
    bench AS (
      SELECT DISTINCT unnest(fps) AS f FROM fp WHERE doc_id % 97 = 0
    ),
    ex AS (
      SELECT doc_id, unnest(fps) AS f FROM fp WHERE doc_id % 97 <> 0
    ),
    hit AS (SELECT DISTINCT e.doc_id FROM ex e JOIN bench USING (f))
    SELECT p.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated
    FROM fp p LEFT JOIN hit h USING (doc_id)
    WHERE p.doc_id % 97 <> 0
    GROUP BY p.lang
"""

ORACLES["winnow_fingerprint_stats"] = """
    WITH hs AS (
      SELECT doc_id, lang,
             list_transform(range(1, greatest(len(text) - 4, 0) + 1),
               i -> CAST(('0x' || substr(md5(text[i : i + 4]), 1, 15))
                    AS BIGINT)) AS h
      FROM documents
    ),
    fp AS (
      SELECT doc_id, lang,
        CASE WHEN len(h) >= 4 THEN
          list_distinct(list_transform(range(1, len(h) - 2),
            i -> list_min(h[i : i + 3])))
        ELSE []::BIGINT[] END AS fps
      FROM hs
    ),
    ex AS (SELECT doc_id, unnest(fps) AS f FROM fp),
    byf AS (SELECT f, count(*) AS nd FROM ex GROUP BY f),
    shared AS (
      SELECT DISTINCT e.doc_id FROM ex e JOIN byf USING (f)
      WHERE byf.nd >= 2
    )
    SELECT p.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(p.fps)) AS BIGINT) AS sum_fps,
           CAST(sum(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared_docs
    FROM fp p LEFT JOIN shared s USING (doc_id)
    GROUP BY p.lang
"""

ORACLES["decode_audio_mulaw"] = """
    WITH d AS (
      SELECT doc_id, 40 + doc_id % 50 AS n
      FROM documents WHERE doc_id % 10 = 1
    ),
    s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    u AS (
      SELECT doc_id, n,
             255 - ((doc_id * 31 + i * 17) % 256) AS uu
      FROM s
    ),
    x AS (
      SELECT doc_id, n,
             CASE WHEN uu >= 128
                  THEN 132 - (((uu % 16) * 8 + 132) * (1 << ((uu // 16) % 8)))
                  ELSE (((uu % 16) * 8 + 132) * (1 << ((uu // 16) % 8))) - 132
             END AS v
      FROM u
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(max(abs(v)) AS BIGINT) AS peak
    FROM x GROUP BY doc_id
"""

ORACLES["resize_image_stats"] = """
    WITH d AS (
      SELECT doc_id,
             10 + doc_id % 14 AS w,
             9 + doc_id % 10 AS h
      FROM documents WHERE doc_id < 300
    ),
    px AS (
      SELECT doc_id, w, h,
             unnest(range(0, 4 * 6 * 3)) AS p
      FROM d
    ),
    m AS (
      -- target pixel p = (y*6 + x)*3 + c maps to source flat index
      -- ((sy*w + sx)*3 + c) with sy = (y*h)//4, sx = (x*w)//6.
      SELECT doc_id,
             (doc_id * 7 +
              (((((p // 3) // 6) * h // 4) * w
                + (((p // 3) % 6) * w // 6)) * 3 + (p % 3)) * 13
             ) % 256 AS b
      FROM px
    )
    SELECT doc_id,
           CAST(4 AS INTEGER) AS resized_height,
           CAST(6 AS INTEGER) AS resized_width,
           CAST(sum(b) AS BIGINT) AS resized_pixel_sum
    FROM m GROUP BY doc_id
"""

ORACLES["decode_audio_alaw"] = """
    WITH d AS (
      SELECT doc_id, 40 + doc_id % 50 AS n
      FROM documents WHERE doc_id % 10 = 2
    ),
    s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    a AS (
      SELECT doc_id, n,
             xor((doc_id * 31 + i * 17) % 256, 85) AS aa
      FROM s
    ),
    x AS (
      SELECT doc_id, n,
        (CASE WHEN aa >= 128 THEN 1 ELSE -1 END)
        * (CASE WHEN (aa // 16) % 8 = 0
                THEN (2 * (aa % 16) + 1) * 8
                ELSE (2 * (aa % 16) + 33) * (1 << ((aa // 16) % 8 + 2))
           END) AS v
      FROM a
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(max(abs(v)) AS BIGINT) AS peak
    FROM x GROUP BY doc_id
"""

ORACLES["decode_image_interlaced"] = ORACLE_PNG_INTERLACED
ORACLES["decode_image_png16"] = ORACLE_PNG16

ORACLES["decode_audio_flac"] = """
    WITH d AS (
      SELECT doc_id, 40 + 2 * (doc_id % 25) AS n,
             1 + (doc_id // 10) % 2 AS ch
      FROM documents WHERE doc_id % 10 = 4
    ),
    s AS (SELECT doc_id, n, ch, unnest(range(0, n * ch)) AS i FROM d),
    x AS (
      -- wasted-bits docs ((doc_id // 10) % 8 = 6) floor samples to
      -- multiples of 4 (arithmetic >>2 <<2 = floor toward -inf)
      SELECT doc_id, n, ch,
             CASE WHEN (doc_id // 10) % 8 = 6
                  THEN CAST(floor(
                    ((doc_id * 31 + i * 17) % 65536 - 32768) / 4.0
                  ) * 4 AS BIGINT)
                  ELSE (doc_id * 31 + i * 17) % 65536 - 32768 END AS v
      FROM s
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(max(ch) AS INTEGER) AS n_channels,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(max(abs(v)) AS BIGINT) AS peak
    FROM x GROUP BY doc_id
"""

ORACLES["audio_frame_features"] = """
    WITH d AS (
      SELECT doc_id, 50 + doc_id % 40 AS n
      FROM documents WHERE doc_id % 10 = 0
    ),
    s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    x AS (
      SELECT doc_id, n, i,
             ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
      FROM s
    ),
    w AS (
      SELECT doc_id, n, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM x
    )
    SELECT doc_id,
           CAST(ceil(max(n) / 32.0) AS BIGINT) AS n_frames,
           CAST(sum(v * v) AS BIGINT) AS total_energy,
           CAST(sum(CASE WHEN i % 32 <> 0 AND (v < 0) <> (pv < 0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS total_zc,
           CAST(max(abs(v)) AS BIGINT) AS max_peak
    FROM w GROUP BY doc_id
"""

ORACLES["segment_dedup_stats"] = """
    WITH toks AS (
      SELECT doc_id, lang, trim(text) AS t0,
             list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x <> '') AS tk
      FROM documents
    ),
    segs AS (
      SELECT doc_id, lang, t0,
             CASE WHEN len(tk) > 0 THEN
               list_transform(range(0, CAST(ceil(len(tk)/8.0) AS INT)),
                 i -> array_to_string(tk[(i*8+1):(i*8+8)], ' '))
             ELSE []::VARCHAR[] END AS sg
      FROM toks
    ),
    ex AS (
      SELECT doc_id, generate_subscripts(sg, 1) AS pos, unnest(sg) AS seg
      FROM segs
    ),
    kept AS (
      SELECT doc_id, seg, pos,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
      FROM ex
    ),
    re AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text_dedup
      FROM kept WHERE rn = 1 GROUP BY doc_id
    )
    SELECT s.lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(coalesce(r.text_dedup, ''))) AS BIGINT)
             AS sum_kept_chars,
           CAST(sum(CASE WHEN length(coalesce(r.text_dedup, ''))
                              = length(s.t0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_untouched
    FROM segs s LEFT JOIN re r USING (doc_id)
    GROUP BY s.lang
"""

ORACLES["domain_capped_stats"] = """
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM ranked WHERE rk <= 40 GROUP BY source
"""

ORACLES["export_shard_stats"] = """
    SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                AS BIGINT) % 8 AS INTEGER) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1
"""

ORACLES["webdataset_export_stats"] = ORACLE_WEBDATASET
ORACLES["epoch_shuffle_stats"] = ORACLE_EPOCH_SHUFFLE
ORACLES["quantile_sketch_rollup"] = ORACLE_QUANTILE_SKETCH
ORACLES["greedy_pack_stats"] = ORACLE_GREEDY_PACK


# --- round 9 additions: encoding repair, curriculum order, corpus diff ------


#: Mojibake-injection prefix: cp1252 printables (curly quotes, em dash,
#: euro) plus 2-byte Latin-1-supplement letters, so both UTF-8 widths
#: and both corruption flavors (WHATWG windows-1252 and plain latin-1)
#: are exercised.
_MOJI_PREFIX = "“Café” — naïve façade: €9 "


def q_fix_mojibake_stats(spark, sf_dir):
    # Encoding-repair grade over three deterministically prepared row
    # classes: doc_id%3==0 gets WHATWG windows-1252 mojibake (UTF-8
    # bytes re-read as cp1252, undefined bytes passing through as C1
    # controls — exactly what a charset-mislabeling crawler produces),
    # %3==1 gets plain latin-1 mojibake, and %3==2 keeps clean text
    # with a lone " Ã" appended (mojibake-SHAPED but invalid as UTF-8 —
    # the guard must leave it alone). Both corruptions are built in
    # pure Catalyst (encode/decode/translate), fix_mojibake repairs,
    # and n_exact counts rows whose repaired text equals the known
    # expected value — so the grade proves byte-exact inversion AND
    # false-positive safety, per lang. The oracle recomputes every
    # column from first principles (char/byte length arithmetic).
    from ..utils import spread_rows
    from .text import CP1252_CONTROL, CP1252_PRINTABLE

    # the corrupt+repair chain is a heavy pure-Catalyst projection
    # (~80 us/doc): spread a few-file scan across cores first
    # (SCALE.md hazard 1; measured 3.9 -> 0.6 s at sf1)
    docs = spread_rows(_read(spark, sf_dir, "documents"))
    clean = F.concat(F.lit(_MOJI_PREFIX), F.col("text"))
    as_latin1 = F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1")
    mode = F.col("doc_id") % 3
    dirty = (
        F.when(mode == 0, F.translate(as_latin1, CP1252_CONTROL, CP1252_PRINTABLE))
        .when(mode == 1, as_latin1)
        .otherwise(F.concat(clean, F.lit(" Ã")))
    )
    expected = F.when(mode < 2, clean).otherwise(F.concat(clean, F.lit(" Ã")))
    prepared = docs.select(
        "doc_id", "lang", dirty.alias("t"), expected.alias("expected")
    )
    fixed = X.fix_mojibake(prepared, "t", flag_column="repaired")
    return fixed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("repaired").cast("long")).alias("n_repaired"),
        F.sum((F.col("text_fixed") == F.col("expected")).cast("long")).alias(
            "n_exact"
        ),
        F.sum(F.length("t")).alias("chars_dirty"),
        F.sum(F.length("text_fixed")).alias("chars_fixed"),
    )


def q_curriculum_order_stats(spark, sf_dir):
    # Tier-major deterministic training order: tiers from document
    # length (cheap stand-in for a quality score), then
    # curriculum_order's per-shard (tier, seeded-hash) positions. The
    # per-(shard, tier) order_checksum sum(pos*doc_id) is order-
    # sensitive, so a hash match proves the exact curriculum
    # permutation — tier precedence AND intra-tier shuffle — replays
    # in SQL. min_pos/max_pos prove tiers occupy contiguous position
    # ranges within each shard.
    docs = _read(spark, sf_dir, "documents").withColumn(
        "tier",
        F.least(F.lit(3), F.floor(F.length("text") / F.lit(150))).cast("int"),
    )
    cur = P.curriculum_order(docs, "doc_id", "tier", seed=7, n_shards=8)
    return cur.groupBy("shard", "tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
    )


def q_corpus_diff_stats(spark, sf_dir):
    # Snapshot churn accounting: v_old drops doc_id%7==3, v_new drops
    # doc_id%5==2 and rewrites text for doc_id%13==0 — so every status
    # (added / removed / changed / unchanged) is populated, including
    # ids absent from both. corpus_diff full-outer-joins md5
    # fingerprints; the grade is per-(lang, status) counts plus an
    # id-sum checksum proving exact row classification, which the
    # oracle replays by comparing column values directly.
    docs = _read(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3)
    new = docs.filter(F.col("doc_id") % 5 != 2).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
        ).otherwise(F.col("text")),
    )
    diff = P.corpus_diff(
        old, new, "doc_id", compare_columns=["text", "source"],
        carry_columns=["lang"],
    )
    return diff.groupBy("lang", "status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
    )


QUERIES["fix_mojibake_stats"] = q_fix_mojibake_stats
QUERIES["curriculum_order_stats"] = q_curriculum_order_stats
QUERIES["corpus_diff_stats"] = q_corpus_diff_stats

# P = the injection prefix rebuilt with chr() so the SQL file stays
# ASCII; plen/pbytes are derived, not hardcoded.
ORACLES["fix_mojibake_stats"] = """
    WITH consts AS (
      SELECT chr(8220) || 'Caf' || chr(233) || chr(8221) || ' '
               || chr(8212) || ' na' || chr(239) || 've fa' || chr(231)
               || 'ade: ' || chr(8364) || '9 ' AS p
    ), sized AS (
      SELECT length(p) AS plen, strlen(p) AS pbytes FROM consts
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN d.doc_id % 3 IN (0, 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repaired,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN d.doc_id % 3 IN (0, 1)
                         THEN s.pbytes + strlen(d.text)
                         ELSE s.plen + length(d.text) + 2 END)
                AS BIGINT) AS chars_dirty,
           CAST(sum(s.plen + length(d.text)
                    + CASE WHEN d.doc_id % 3 = 2 THEN 2 ELSE 0 END)
                AS BIGINT) AS chars_fixed
    FROM documents d, sized s
    GROUP BY d.lang
"""

ORACLES["curriculum_order_stats"] = """
    WITH keyed AS (
      SELECT doc_id,
             least(3, CAST(floor(length(text) / 150) AS INT)) AS tier,
             ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)),
                             1, 13))::BIGINT AS ek
      FROM documents
    ), ranked AS (
      SELECT doc_id, tier, CAST(ek % 8 AS INT) AS shard,
             row_number() OVER (PARTITION BY ek % 8
                                ORDER BY tier, ek, doc_id) AS pos
      FROM keyed
    )
    SELECT shard, tier,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(pos) AS INT) AS min_pos,
           CAST(max(pos) AS INT) AS max_pos,
           CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
    FROM ranked GROUP BY shard, tier
"""

ORACLES["corpus_diff_stats"] = """
    WITH old AS (
      SELECT doc_id, lang, text, source FROM documents WHERE doc_id % 7 <> 3
    ), new AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 13 = 0 THEN text || ' [v2]' ELSE text END
               AS text,
             source
      FROM documents WHERE doc_id % 5 <> 2
    ), diff AS (
      SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
             coalesce(n.lang, o.lang) AS lang,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.text <> n.text OR o.source <> n.source
                    THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT lang, status,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM diff GROUP BY lang, status
"""


def q_incremental_vectorize_stats(spark, sf_dir):
    # The reason corpus_diff exists at 100 TB: between two snapshots,
    # only added/changed documents flow through the (expensive)
    # vectorization kernel; unchanged documents REUSE their stored
    # vectors via an id join that never touches text. v1/v2 are the
    # corpus_diff_stats snapshots; the stored-vector table is
    # simulated by vectorizing v1 (in production it's a parquet table
    # from the previous run). The grade proves the union of reused +
    # recomputed vectors equals a full v2 re-vectorization, per
    # (lang, path) — i.e. the incremental shortcut loses nothing.
    docs = _read(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3)
    new = docs.filter(F.col("doc_id") % 5 != 2).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
        ).otherwise(F.col("text")),
    )
    stored = X.hashed_doc_vectors(old, "text", dim=32).select(
        "doc_id", "lang", "doc_vec"
    )
    diff = P.corpus_diff(old, new, "doc_id", compare_columns=["text"])
    reused = stored.join(
        diff.filter(F.col("status") == "unchanged").select("doc_id"),
        "doc_id",
    ).withColumn("path", F.lit("reused"))
    todo = new.join(
        diff.filter(F.col("status").isin("added", "changed")).select("doc_id"),
        "doc_id",
    )
    recomputed = (
        X.hashed_doc_vectors(todo, "text", dim=32)
        .select("doc_id", "lang", "doc_vec")
        .withColumn("path", F.lit("recomputed"))
    )
    final = reused.select("doc_id", "lang", "doc_vec", "path").unionByName(
        recomputed
    )
    sq = F.aggregate("doc_vec", F.lit(0).cast("long"), lambda a, x: a + x * x)
    return final.groupBy("lang", "path").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(sq).cast("long").alias("sum_sq_norm"),
        F.sum(F.element_at("doc_vec", 1)).cast("long").alias("sum_slot0"),
    )


QUERIES["incremental_vectorize_stats"] = q_incremental_vectorize_stats

# The oracle re-vectorizes v2 FROM SCRATCH and maps the diff status to
# the expected path — so a value match proves the incremental plan
# (reuse + subset recompute) is indistinguishable from full recompute.
ORACLES["incremental_vectorize_stats"] = """
    WITH new AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 13 = 0 THEN text || ' [v2]' ELSE text END
               AS text
      FROM documents WHERE doc_id % 5 <> 2
    ), old AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3
    ), pathed AS (
      SELECT n.doc_id, n.lang, n.text,
             CASE WHEN o.doc_id IS NULL THEN 'recomputed'
                  WHEN o.text <> n.text THEN 'recomputed'
                  ELSE 'reused' END AS path
      FROM new n LEFT JOIN old o ON n.doc_id = o.doc_id
    ), toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '')) AS tok
      FROM pathed
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv
      FROM toks
    ), slots AS (
      SELECT doc_id, hv % 32 AS slot, 1 - 2 * ((hv // 32) % 2) AS sgn
      FROM h
    ), per AS (
      SELECT doc_id, slot, sum(sgn) AS v
      FROM slots GROUP BY doc_id, slot
    ), norms AS (
      SELECT doc_id, sum(v * v) AS sq,
             sum(CASE WHEN slot = 0 THEN v ELSE 0 END) AS v0
      FROM per GROUP BY doc_id
    )
    SELECT p.lang, p.path,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(n.sq, 0)) AS BIGINT) AS sum_sq_norm,
           CAST(sum(coalesce(n.v0, 0)) AS BIGINT) AS sum_slot0
    FROM pathed p LEFT JOIN norms n USING (doc_id)
    GROUP BY p.lang, p.path
"""


def q_corpus_drift_stats(spark, sf_dir):
    # Snapshot drift report: per-language doc counts, corpus shares,
    # absolute share drift, and mean document length across the same
    # v1/v2 fork as corpus_diff_stats — the acceptance readout a crawl
    # pipeline checks before promoting a new snapshot (a lang whose
    # share moves is a crawler/extraction regression signal). Two
    # per-lang aggregates + one tiny full-outer join + two single-row
    # total broadcasts; shares/means are double divisions of exact
    # longs, so both engines produce bit-identical IEEE results.
    docs = _read(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3)
    new = docs.filter(F.col("doc_id") % 5 != 2)

    def per_lang(side, tag):
        return side.groupBy("lang").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("n_chars").alias(f"chars_{tag}"),
        )
    o, n = per_lang(old, "old"), per_lang(new, "new")
    j = o.join(n, "lang", "full_outer").select(
        "lang",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        F.coalesce("chars_old", F.lit(0)).alias("chars_old"),
        F.coalesce("chars_new", F.lit(0)).alias("chars_new"),
    )
    # totals from the (langs-sized) aggregate, NOT a corpus re-scan:
    # one single-row cross join, broadcast by AQE
    tot = j.groupBy().agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    j = j.crossJoin(F.broadcast(tot))
    share_o = F.col("n_old") / F.col("t_old").cast("double")
    share_n = F.col("n_new") / F.col("t_new").cast("double")
    return j.select(
        "lang", "n_old", "n_new",
        share_o.alias("share_old"),
        share_n.alias("share_new"),
        F.abs(share_n - share_o).alias("share_drift"),
        (F.col("chars_old") / F.col("n_old")).alias("mean_chars_old"),
        (F.col("chars_new") / F.col("n_new")).alias("mean_chars_new"),
    )


QUERIES["corpus_drift_stats"] = q_corpus_drift_stats

ORACLES["corpus_drift_stats"] = """
    WITH old AS (
      SELECT lang, count(*) AS n_old, sum(n_chars) AS chars_old
      FROM documents WHERE doc_id % 7 <> 3 GROUP BY lang
    ), new AS (
      SELECT lang, count(*) AS n_new, sum(n_chars) AS chars_new
      FROM documents WHERE doc_id % 5 <> 2 GROUP BY lang
    ), tot AS (
      SELECT (SELECT sum(n_old) FROM old) AS t_old,
             (SELECT sum(n_new) FROM new) AS t_new
    )
    SELECT coalesce(o.lang, n.lang) AS lang,
           CAST(coalesce(o.n_old, 0) AS BIGINT) AS n_old,
           CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
           CAST(coalesce(o.n_old, 0) AS DOUBLE) / t.t_old AS share_old,
           CAST(coalesce(n.n_new, 0) AS DOUBLE) / t.t_new AS share_new,
           abs(CAST(coalesce(n.n_new, 0) AS DOUBLE) / t.t_new
               - CAST(coalesce(o.n_old, 0) AS DOUBLE) / t.t_old)
             AS share_drift,
           CAST(coalesce(o.chars_old, 0) AS DOUBLE)
             / coalesce(o.n_old, 0) AS mean_chars_old,
           CAST(coalesce(n.chars_new, 0) AS DOUBLE)
             / coalesce(n.n_new, 0) AS mean_chars_new
    FROM old o FULL OUTER JOIN new n ON o.lang = n.lang, tot t
"""


def q_ingest_repair_pipeline(spark, sf_dir):
    # Stage-0 ingest composition: encoding repair -> normalization ->
    # token accounting, the order a crawl pipeline actually runs (a
    # mojibake curly quote must be repaired BEFORE normalize_text can
    # fold it to ASCII, and tokens are counted on the normalized
    # form). Half the corpus arrives WHATWG-mojibaked in-query; the
    # grade proves the composed chain lands every row on the same
    # normalized text as the never-corrupted path — the oracle replays
    # normalize+tokenize over clean text only, so any repair residue
    # breaks the hash. Entirely pure Catalyst: one projection chain,
    # one aggregation shuffle, zero Python.
    from ..utils import spread_rows
    from .text import CP1252_CONTROL, CP1252_PRINTABLE

    # heavy repair+normalize+tokenize projection: spread a few-file
    # scan across cores first (SCALE.md hazard 1)
    docs = spread_rows(_read(spark, sf_dir, "documents"))
    clean = F.concat(F.lit(_MOJI_PREFIX), F.col("text"))
    as_latin1 = F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1")
    dirty = F.when(
        F.col("doc_id") % 2 == 0,
        F.translate(as_latin1, CP1252_CONTROL, CP1252_PRINTABLE),
    ).otherwise(clean)
    prepared = docs.select("doc_id", "lang", dirty.alias("text"))
    repaired = X.fix_mojibake(prepared, "text", flag_column="was_repaired")
    norm = X.normalize_text(repaired, "text_fixed")
    counted = X.token_count(norm, "text_norm")
    return counted.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("was_repaired").cast("long")).alias("n_repaired"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.length("text_norm")).alias("chars_norm"),
    )


QUERIES["ingest_repair_pipeline"] = q_ingest_repair_pipeline

ORACLES["ingest_repair_pipeline"] = r"""
    WITH consts AS (
      SELECT chr(8220) || 'Caf' || chr(233) || chr(8221) || ' '
               || chr(8212) || ' na' || chr(239) || 've fa' || chr(231)
               || 'ade: ' || chr(8364) || '9 ' AS p
    ), clean AS (
      SELECT d.lang, d.doc_id, c.p || d.text AS text
      FROM documents d, consts c
    ), norm AS (
      SELECT lang, doc_id,
        trim(regexp_replace(
          lower(
            replace(
              translate(
                regexp_replace(text,
                  '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                chr(8216) || chr(8217) || chr(8218) || chr(8242)
                  || chr(8220) || chr(8221) || chr(8222) || chr(8243)
                  || chr(8211) || chr(8212) || chr(160) || chr(8239)
                  || chr(8201),
                repeat(chr(39), 4) || repeat(chr(34), 4) || '--   '),
              chr(8230), '...')
          ),
          '\s+', ' ', 'g')) AS text_norm
      FROM clean
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repaired,
           CAST(sum(len(list_filter(
               string_split_regex(trim(text_norm), '\s+'),
               x -> x <> ''))) AS BIGINT) AS total_tokens,
           CAST(sum(length(text_norm)) AS BIGINT) AS chars_norm
    FROM norm GROUP BY lang
"""
