"""Source layer: file formats -> schema-coerced DataFrames -> Session.

The reference has no connector layer — ingestion is "hand me a Spark
DataFrame" (reference session.py:336-401). This module supplies the
missing piece for real pipelines: format readers that land directly in
the engine's five-type system (INTEGER/DECIMAL/VARCHAR/DATE/TIMESTAMP,
with Int->Long / Float->Double widening), preserving Spark's predicate
pushdown and partition pruning on the way in.
"""

from . import fs
from .readers import (
    compact_table,
    ab_test_summary,
    correlation_matrix,
    numeric_summary,
    profile_columns,
    read_table,
    read_warehouse_table,
    session_from_files,
    write_bucketed_table,
    write_table,
)
from .warc import (
    read_warc,
    read_warc_stream,
    write_warc,
    write_wat,
    write_wet,
)

__all__ = [
    "fs",
    "read_warc",
    "read_warc_stream",
    "write_warc",
    "write_wat",
    "write_wet",
    "ab_test_summary",
    "correlation_matrix",
    "numeric_summary",
    "profile_columns",
    "compact_table",
    "read_table",
    "read_warehouse_table",
    "session_from_files",
    "write_bucketed_table",
    "write_table",
]
