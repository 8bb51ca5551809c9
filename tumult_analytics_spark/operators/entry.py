"""Driver-contract queries for the pipeline operators (dedup, text,
similarity, multimodal, windowed events). Oracle SQL is provided wherever
the computation is exactly reproducible in ANSI SQL (integer arithmetic or
identical-formula double math); hash/LSH-based ops are rows-only."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D
from . import similarity as S
from . import text as X


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
    # LSH near-dup removal; hash-based, rows-only check.
    docs = _read(spark, sf_dir, "documents")
    kept = D.minhash_lsh_dedup(
        docs, "text", "doc_id", num_hashes=32, bands=8,
        min_signature_similarity=0.7,
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def q_simhash_buckets(spark, sf_dir):
    # SimHash fingerprints bucketed by top byte; rows-only check.
    docs = _read(spark, sf_dir, "documents")
    sh = D.simhash(docs, "text", "doc_id")
    return (
        sh.withColumn("bucket", F.shiftrightunsigned("simhash", 56))
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
    docs = _read(spark, sf_dir, "documents")
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
        emb, "embedding", "vec_id", k=10**6, queries=queries
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        allk.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"))
    )


def q_ann_ivf_topk(spark, sf_dir):
    # IVF coarse-quantizer ANN; rows-only.
    emb = _read(spark, sf_dir, "embeddings")
    topk = S.ivf_cosine_topk(emb, "embedding", "vec_id", k=3, nlist=16, nprobe=4)
    return topk.groupBy().agg(F.count(F.lit(1)).alias("n_results"))


def q_ann_lsh_topk(spark, sf_dir):
    # LSH-bucketed approximate top-3; rows-only.
    emb = _read(spark, sf_dir, "embeddings").filter("vec_id < 2000")
    topk = S.lsh_cosine_topk(emb, "embedding", "vec_id", k=3, bits=6, tables=2)
    return topk.groupBy().agg(F.count(F.lit(1)).alias("n_results"))


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


def q_cosine_dedup(spark, sf_dir):
    # Embedding-cosine near-dup removal, exact pairwise path (drop a row
    # iff some smaller-id row has cosine >= 0.97). SQL-reproducible via
    # NOT EXISTS; the LSH-bucketed scale path is covered by
    # tests/test_sources_streaming + the ann_lsh query.
    emb = _read(spark, sf_dir, "embeddings")
    kept = D.embedding_cosine_dedup(
        emb, "embedding", "vec_id", threshold=0.97, use_lsh=False
    )
    return kept.groupBy("label").agg(F.count(F.lit(1)).alias("n_kept"))


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


# --- events (hypertable-style rollup, batch form) --------------------------


def q_event_hourly_rollup(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")  # ts = BIGINT nanoseconds
    return (
        ev.withColumn("hour_id", (F.col("ts") / F.lit(3_600_000_000_000)).cast("long"))
        .groupBy("hour_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "fingerprint_dedup": q_fingerprint_dedup,
    "minhash_dedup": q_minhash_dedup,
    "simhash_buckets": q_simhash_buckets,
    "ngram_jaccard": q_ngram_jaccard,
    "token_stats": q_token_stats,
    "quality_stats": q_quality_stats,
    "language_id": q_language_id,
    "ann_brute_topk": q_ann_brute_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "event_hourly_rollup": q_event_hourly_rollup,
    "bpe_token_count": q_bpe_token_count,
    "media_metadata": q_media_metadata,
    "byte_histogram_features": q_byte_histogram_features,
    "cosine_dedup": q_cosine_dedup,
    "pipeline_compose": q_pipeline_compose,
}

ORACLES = {
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
    "cosine_dedup": """
        SELECT label, CAST(count(*) AS BIGINT) AS n_kept
        FROM embeddings e
        WHERE NOT EXISTS (
          SELECT 1 FROM embeddings o
          WHERE o.vec_id < e.vec_id
            AND list_cosine_similarity(
                CAST(o.embedding AS DOUBLE[]),
                CAST(e.embedding AS DOUBLE[])) >= 0.97)
        GROUP BY label
    """,
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
}
