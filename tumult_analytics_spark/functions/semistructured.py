"""Semi-structured (JSON) column handling: typed field extraction from
the JSON-string payload columns event pipelines carry (`props`,
`metadata`, `extra`, ...).

Scale design: `get_json_object` / `from_json` are JVM-side Catalyst
expressions — whole-stage codegen, zero Python, no shuffle; a pipeline
that explodes JSON into columns early keeps every downstream filter
pushdown-friendly and lets Parquet prune the (often large) raw JSON
string column away once the typed columns exist.
"""

from __future__ import annotations

from typing import Mapping, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_json_fields"]


def extract_json_fields(
    df: DataFrame,
    json_column: str,
    fields: Mapping[str, Tuple[str, str]],
) -> DataFrame:
    """Extract typed fields from a JSON string column.

    ``fields`` maps output column name -> (JSONPath, Spark type name),
    e.g. ``{"k": ("$.k", "long")}``. Missing keys, nulls, and malformed
    JSON all yield null (``get_json_object`` semantics — no exceptions,
    the right contract for crawl-grade data). The raw column is kept;
    drop it downstream to let Parquet prune it at the scan.
    """
    if not fields:
        raise ValueError("fields must not be empty")
    out = df
    for name, (path, dtype) in fields.items():
        out = out.withColumn(
            name,
            F.get_json_object(F.col(json_column), path).cast(dtype),
        )
    return out
