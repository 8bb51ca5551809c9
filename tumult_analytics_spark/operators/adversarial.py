"""Adversarial duplicate-heavy corpus fixture (round-10).

Every dedup grade before this round ran on synthetic corpora with
benign duplicate-cluster sizes, which is exactly the blind spot the
banded-LSH hot-bucket pathology hides in: a real crawl's boilerplate
clusters (identical 404/consent pages) are 10^4-10^7 copies, and an
unguarded banded self-join emits ~m^2/2 candidate pairs from each.

This module builds a deterministic corpus with the pathological shape
on top of the driver's ``documents`` table:

* an ``identical`` block: ``dup_copies`` byte-identical documents
  (one signature group — must collapse to a single banded row);
* a ``clique`` block: ``clique_size`` DISTINCT near-duplicates (long
  shared prefix, tiny per-doc suffix) that share band hashes without
  being byte-identical — the residual case the hot-bucket star cap
  guards;
* the ``base`` documents, id-shifted above both blocks so synthetic
  rows never become bucket minima for real documents.

The construction is replicated exactly in DuckDB SQL
(:func:`adversarial_corpus_sql`) so LSH dedup over it is value-graded
end to end. ids: clique = [0, clique_size), identical =
[IDENTICAL_BASE, IDENTICAL_BASE + dup_copies), base = doc_id +
BASE_SHIFT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Alien token streams — no 5-gram overlap with the driver's documents
#: text or with each other, so the synthetic blocks never collide with
#: base-corpus buckets.
CLIQUE_UNIT = "zq7 xv9 kd3 mw8 pl2 rt6 "
DUP_UNIT = "bk4 qn8 vz2 hw6 sj9 mf3 "
CLIQUE_REPEATS = 50
DUP_REPEATS = 12

IDENTICAL_BASE = 100_000
BASE_SHIFT = 10_000_000


def adversarial_corpus(
    spark: SparkSession,
    base_docs: DataFrame,
    clique_size: int = 2000,
    dup_copies: int = 10_000,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> DataFrame:
    """(doc_id, text): clique ++ identical block ++ id-shifted base."""
    clique = spark.range(clique_size).select(
        F.col("id").alias(id_column),
        F.concat(
            F.lit(CLIQUE_UNIT * CLIQUE_REPEATS),
            F.lit(" v"),
            F.col("id").cast("string"),
        ).alias(text_column),
    )
    dups = spark.range(dup_copies).select(
        (F.col("id") + F.lit(IDENTICAL_BASE)).alias(id_column),
        F.lit(DUP_UNIT * DUP_REPEATS).alias(text_column),
    )
    base = base_docs.select(
        (F.col(id_column) + F.lit(BASE_SHIFT)).alias(id_column),
        F.col(text_column),
    )
    return clique.unionByName(dups).unionByName(base)


def adversarial_corpus_sql(
    documents_view: str = "documents",
    clique_size: int = 2000,
    dup_copies: int = 10_000,
) -> str:
    """DuckDB CTE body producing the identical corpus (doc_id, text)."""
    return f"""
      SELECT CAST(i AS BIGINT) AS doc_id,
             repeat('{CLIQUE_UNIT}', {CLIQUE_REPEATS})
               || ' v' || CAST(i AS VARCHAR) AS text
      FROM range({clique_size}) t(i)
      UNION ALL
      SELECT CAST({IDENTICAL_BASE} + i AS BIGINT) AS doc_id,
             repeat('{DUP_UNIT}', {DUP_REPEATS}) AS text
      FROM range({dup_copies}) t(i)
      UNION ALL
      SELECT doc_id + {BASE_SHIFT} AS doc_id, text FROM {documents_view}
    """


def segment_column(id_column: str = "doc_id"):
    """clique / identical / base classifier for grading aggregates."""
    return (
        F.when(F.col(id_column) < IDENTICAL_BASE, F.lit("clique"))
        .when(F.col(id_column) < BASE_SHIFT, F.lit("identical"))
        .otherwise(F.lit("base"))
    )
