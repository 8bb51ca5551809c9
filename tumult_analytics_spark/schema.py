"""Type system and schema model.

Reimplements the semantics surveyed from the reference
(``/root/reference/src/tmlt/analytics/_schema.py`` and
``_coerce_spark_schema.py``) on idiomatic PySpark:

- exactly five scalar column types (SQL92 names), _schema.py:129-169;
- Spark type mapping with widening coercion Int->Long, Float->Double,
  _coerce_spark_schema.py:31-35;
- everything else rejected at ingestion, _coerce_spark_schema.py:20-29;
- per-column null/NaN/inf flags that drive the special-value rewrite rules,
  _schema.py:180-196;
- optional table-level ``grouping_column`` / ``id_column`` / ``id_space``
  annotations, _schema.py:206-247.

No code is copied from the reference; this file is a fresh implementation of
the documented behavior.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from enum import Enum
from typing import Dict, Iterator, Mapping, Optional, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ColumnType(Enum):
    """The five supported scalar column types."""

    INTEGER = "INTEGER"
    DECIMAL = "DECIMAL"
    VARCHAR = "VARCHAR"
    DATE = "DATE"
    TIMESTAMP = "TIMESTAMP"

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"ColumnType.{self.name}"


#: Canonical Spark type for each analytics type.
SPARK_TYPE: Dict[ColumnType, T.DataType] = {
    ColumnType.INTEGER: T.LongType(),
    ColumnType.DECIMAL: T.DoubleType(),
    ColumnType.VARCHAR: T.StringType(),
    ColumnType.DATE: T.DateType(),
    ColumnType.TIMESTAMP: T.TimestampType(),
}

#: Spark types accepted at ingestion, mapped to the analytics type.
#: TimestampNTZType is accepted (Spark 4 reads parquet timestamps as NTZ)
#: and deliberately NOT cast to TimestampType: that cast would reinterpret
#: values through the session timezone.
ACCEPTED_SPARK_TYPES: Dict[type, ColumnType] = {
    T.IntegerType: ColumnType.INTEGER,
    T.LongType: ColumnType.INTEGER,
    T.FloatType: ColumnType.DECIMAL,
    T.DoubleType: ColumnType.DECIMAL,
    T.StringType: ColumnType.VARCHAR,
    T.DateType: ColumnType.DATE,
    T.TimestampType: ColumnType.TIMESTAMP,
    T.TimestampNTZType: ColumnType.TIMESTAMP,
}

#: Types left untouched by coercion even though a canonical type differs.
_NO_CAST_TYPES = (T.TimestampNTZType,)

#: Python types accepted when building KeySets / literals.
PYTHON_TYPE: Dict[ColumnType, tuple] = {
    ColumnType.INTEGER: (int,),
    ColumnType.DECIMAL: (float, int),
    ColumnType.VARCHAR: (str,),
    ColumnType.DATE: (datetime.date,),
    ColumnType.TIMESTAMP: (datetime.datetime,),
}


@dataclass(frozen=True)
class ColumnDescriptor:
    """Type plus special-value flags for one column."""

    column_type: ColumnType
    allow_null: bool = False
    allow_nan: bool = False
    allow_inf: bool = False

    def __post_init__(self) -> None:
        if self.column_type is not ColumnType.DECIMAL and (
            self.allow_nan or self.allow_inf
        ):
            object.__setattr__(self, "allow_nan", False)
            object.__setattr__(self, "allow_inf", False)


def _norm(desc: Union[ColumnDescriptor, ColumnType, str]) -> ColumnDescriptor:
    if isinstance(desc, ColumnDescriptor):
        return desc
    if isinstance(desc, ColumnType):
        return ColumnDescriptor(desc)
    if isinstance(desc, str):
        return ColumnDescriptor(ColumnType[desc])
    raise TypeError(f"Cannot interpret {desc!r} as a column descriptor")


class Schema(Mapping[str, ColumnDescriptor]):
    """Ordered column->descriptor mapping with optional privacy annotations.

    Equality is order-sensitive, mirroring the reference's FrozenDict
    semantics (_schema.py:60-127).
    """

    def __init__(
        self,
        columns: Mapping[str, Union[ColumnDescriptor, ColumnType, str]],
        grouping_column: Optional[str] = None,
        id_column: Optional[str] = None,
        id_space: Optional[str] = None,
    ) -> None:
        self._columns: Dict[str, ColumnDescriptor] = {}
        for name, desc in columns.items():
            if name == "":
                raise ValueError("Column names may not be empty strings")
            self._columns[name] = _norm(desc)
        for special, label in [
            (grouping_column, "grouping_column"),
            (id_column, "id_column"),
        ]:
            if special is not None and special not in self._columns:
                raise ValueError(f"{label} {special!r} is not in the schema")
        self.grouping_column = grouping_column
        self.id_column = id_column
        self.id_space = id_space

    # Mapping interface -----------------------------------------------------
    def __getitem__(self, key: str) -> ColumnDescriptor:
        return self._columns[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._columns)

    def __len__(self) -> int:
        return len(self._columns)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Schema):
            return NotImplemented
        return (
            list(self._columns.items()) == list(other._columns.items())
            and self.grouping_column == other.grouping_column
            and self.id_column == other.id_column
            and self.id_space == other.id_space
        )

    def __hash__(self) -> int:
        return hash(
            (
                tuple(self._columns.items()),
                self.grouping_column,
                self.id_column,
                self.id_space,
            )
        )

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        cols = ", ".join(f"{k!r}: {v}" for k, v in self._columns.items())
        extras = ""
        if self.grouping_column:
            extras += f", grouping_column={self.grouping_column!r}"
        if self.id_column:
            extras += f", id_column={self.id_column!r}"
        return f"Schema({{{cols}}}{extras})"

    # Conveniences ----------------------------------------------------------
    @property
    def columns(self) -> Tuple[str, ...]:
        return tuple(self._columns)

    @property
    def column_types(self) -> Dict[str, ColumnType]:
        return {k: v.column_type for k, v in self._columns.items()}

    def replace(self, **kwargs) -> "Schema":
        out = Schema(
            dict(self._columns),
            grouping_column=self.grouping_column,
            id_column=self.id_column,
            id_space=self.id_space,
        )
        for k, v in kwargs.items():
            setattr(out, k, v)
        return out

    def to_spark(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(name, SPARK_TYPE[d.column_type], d.allow_null or True)
                for name, d in self._columns.items()
            ]
        )


def schema_from_spark(
    spark_schema: T.StructType,
    grouping_column: Optional[str] = None,
    id_column: Optional[str] = None,
    id_space: Optional[str] = None,
) -> Schema:
    """Derive a Schema from a Spark StructType.

    DataFrames read from Spark are assumed to allow nulls everywhere and
    NaN/inf in every DECIMAL column (reference _schema.py:453-458).
    """
    cols: Dict[str, ColumnDescriptor] = {}
    for field in spark_schema.fields:
        ctype = ACCEPTED_SPARK_TYPES.get(type(field.dataType))
        if ctype is None:
            raise ValueError(
                f"Column {field.name!r} has unsupported Spark type "
                f"{field.dataType.simpleString()}; supported: int, bigint, "
                "float, double, string, date, timestamp"
            )
        is_dec = ctype is ColumnType.DECIMAL
        cols[field.name] = ColumnDescriptor(
            ctype, allow_null=True, allow_nan=is_dec, allow_inf=is_dec
        )
    return Schema(
        cols, grouping_column=grouping_column, id_column=id_column, id_space=id_space
    )


def coerce_spark_schema(df: DataFrame) -> DataFrame:
    """Validate and widen a DataFrame to canonical analytics types.

    Int->Long and Float->Double casts; rejects unsupported types and empty
    column names (reference _coerce_spark_schema.py:38-78). The casts are
    plain Catalyst ``cast`` expressions, so they stay inside whole-stage
    codegen and cost nothing extra at scale.
    """
    casts = []
    for field in df.schema.fields:
        if field.name == "":
            raise ValueError("Column names may not be empty strings")
        dt = type(field.dataType)
        if dt not in ACCEPTED_SPARK_TYPES:
            raise ValueError(
                f"Column {field.name!r} has unsupported Spark type "
                f"{field.dataType.simpleString()}"
            )
        if dt in (t for t in _NO_CAST_TYPES):
            continue
        target = SPARK_TYPE[ACCEPTED_SPARK_TYPES[dt]]
        if field.dataType != target:
            casts.append((field.name, target))
    if not casts:
        return df
    return df.withColumns({name: F.col(name).cast(t) for name, t in casts})


class AnalyticsDefault:
    """Default replacement values for nulls/NaNs (_query_expr.py:1053-1071)."""

    INTEGER = 0
    DECIMAL = 0.0
    VARCHAR = ""
    DATE = datetime.date.fromtimestamp(0)
    TIMESTAMP = datetime.datetime.fromtimestamp(0)

    @classmethod
    def for_type(cls, ctype: ColumnType):
        return {
            ColumnType.INTEGER: cls.INTEGER,
            ColumnType.DECIMAL: cls.DECIMAL,
            ColumnType.VARCHAR: cls.VARCHAR,
            ColumnType.DATE: cls.DATE,
            ColumnType.TIMESTAMP: cls.TIMESTAMP,
        }[ctype]


class AnalyticsInternalError(RuntimeError):
    """Internal invariant violation."""
