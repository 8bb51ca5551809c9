"""Binning specification.

Fresh implementation of the behavior of
``/root/reference/src/tmlt/analytics/binning_spec.py:122-336``:

- ``right=True`` (default): bins are right-closed ``(a, b]``;
  ``include_both_endpoints=True`` additionally closes the first bin ``[a, b]``.
- ``right=False``: left-closed ``[a, b)``; include_both_endpoints closes the
  last bin.
- Out-of-range values, nulls, and (by default) NaNs map to null; an optional
  ``nan_bin`` gives NaNs their own bin.
- Default labels like ``"[0, 5]"`` / ``"(5, 10]"`` (binning_spec.py:93-118);
  floats rendered at the smallest precision in 2..16 that distinguishes all
  edges (binning_spec.py:60-67); strings are repr-quoted.

Unlike the reference (which compiles binning to a row-level Python map UDF),
this implementation compiles to a Catalyst ``CASE WHEN`` chain over the
edges, so binning stays inside whole-stage codegen — no Python boundary at
all. For a spec with B bins that is a B-branch expression evaluated per row,
which vectorizes fine for the typical B <= a few hundred.
"""

from __future__ import annotations

import datetime
import math
from bisect import bisect_left, bisect_right
from typing import Any, List, Optional, Sequence, Tuple, TypeVar, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from .schema import ColumnDescriptor, ColumnType

BinT = TypeVar("BinT")
BinNameT = TypeVar("BinNameT")


def _py_column_type(value: Any) -> ColumnType:
    # bool is an int subclass; exclude it explicitly.
    if isinstance(value, bool):
        raise ValueError(f"Unsupported bin value type: {type(value).__name__}")
    if isinstance(value, int):
        return ColumnType.INTEGER
    if isinstance(value, float):
        return ColumnType.DECIMAL
    if isinstance(value, str):
        return ColumnType.VARCHAR
    if isinstance(value, datetime.datetime):
        return ColumnType.TIMESTAMP
    if isinstance(value, datetime.date):
        return ColumnType.DATE
    raise ValueError(f"Unsupported bin value type: {type(value).__name__}")


def _edges_as_str(edges: Sequence[Any]) -> Tuple[str, ...]:
    first = edges[0]
    if isinstance(first, float):
        for precision in range(2, 17):
            strs = tuple(f"{e:.{precision}f}" for e in edges)
            if len(strs) == len(set(strs)):
                return strs
        raise RuntimeError("Unable to render distinct float bin edges")
    if isinstance(first, datetime.datetime):
        if any(e.microsecond % 1000 for e in edges):
            timespec = "microseconds"
        elif any(e.microsecond for e in edges):
            timespec = "milliseconds"
        elif any(e.second for e in edges):
            timespec = "seconds"
        else:
            timespec = "minutes"
        return tuple(e.isoformat(sep=" ", timespec=timespec) for e in edges)
    if isinstance(first, str):
        return tuple(repr(e) for e in edges)
    return tuple(str(e) for e in edges)


def _default_names(
    edges: Sequence[Any], right: bool, include_edges: bool
) -> List[str]:
    s = _edges_as_str(edges)
    n = len(edges) - 1
    if right:
        names = [f"({s[i]}, {s[i + 1]}]" for i in range(n)]
        if include_edges:
            names[0] = f"[{s[0]}, {s[1]}]"
    else:
        names = [f"[{s[i]}, {s[i + 1]})" for i in range(n)]
        if include_edges:
            names[-1] = f"[{s[-2]}, {s[-1]}]"
    return names


class BinningSpec:
    """Assigns values to labeled bins based on sorted edges."""

    def __init__(
        self,
        bin_edges: Sequence[Any],
        names: Optional[Sequence[Any]] = None,
        right: bool = True,
        include_both_endpoints: bool = True,
        nan_bin: Optional[Any] = None,
    ):
        try:  # accept numpy arrays without importing numpy eagerly
            import numpy as np

            if isinstance(bin_edges, np.ndarray):
                bin_edges = bin_edges.tolist()
            if isinstance(names, np.ndarray):
                names = names.tolist()
        except ImportError:  # pragma: no cover
            pass
        edges = list(bin_edges)
        if len(edges) < 2:
            raise ValueError("At least two bin edges must be provided")
        self._input_type = _py_column_type(edges[0])
        for e in edges[1:]:
            if _py_column_type(e) is not self._input_type:
                raise ValueError("All bin edges must have the same type")
        if not all(edges[i] < edges[i + 1] for i in range(len(edges) - 1)):
            raise ValueError(
                "Bin edges must be sorted in ascending order, with no duplicates"
            )
        self.bin_edges: Tuple[Any, ...] = tuple(edges)
        if names is None:
            self.names: Tuple[Any, ...] = tuple(
                _default_names(edges, right, include_both_endpoints)
            )
        else:
            if len(names) != len(edges) - 1:
                raise ValueError(
                    "Number of bin names must be one less than the number of bin edges"
                )
            self.names = tuple(names)
        name_types = {_py_column_type(x) for x in self.names if x is not None}
        if len(name_types) > 1:
            raise ValueError("All bin names must have the same type")
        self._output_type = name_types.pop() if name_types else ColumnType.VARCHAR
        if nan_bin is not None and _py_column_type(nan_bin) is not self._output_type:
            raise ValueError("NaN bin name must have the same type as other bin names")
        self.nan_bin = nan_bin
        self.right = right
        self.include_both_endpoints = include_both_endpoints

    # ------------------------------------------------------------------
    @property
    def input_type(self) -> ColumnType:
        return self._input_type

    @property
    def column_descriptor(self) -> ColumnDescriptor:
        # Output is nullable (out-of-range/null inputs), may repeat names.
        return ColumnDescriptor(self._output_type, allow_null=True)

    def bins(self, include_null: bool = False) -> List[Any]:
        names: List[Any] = list(self.names)
        if self.nan_bin is not None:
            names.append(self.nan_bin)
        if include_null:
            names.append(None)
        return list(dict.fromkeys(names))

    def __call__(self, val: Any) -> Any:
        if val is None:
            return None
        if isinstance(val, float) and math.isnan(val):
            return self.nan_bin
        edges, names = self.bin_edges, self.names
        if self.right:
            if self.include_both_endpoints and val == edges[0]:
                return names[0]
            if val <= edges[0] or val > edges[-1]:
                return None
            return names[bisect_left(edges, val) - 1]
        if self.include_both_endpoints and val == edges[-1]:
            return names[-1]
        if val < edges[0] or val >= edges[-1]:
            return None
        return names[bisect_right(edges, val) - 1]

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, BinningSpec):
            raise TypeError(f"Cannot compare BinningSpec with {type(other)}")
        return (
            self.bin_edges == other.bin_edges
            and self.names == other.names
            and self.right == other.right
            and self.include_both_endpoints == other.include_both_endpoints
            and self.nan_bin == other.nan_bin
        )

    def __hash__(self) -> int:
        return hash(
            (
                self.bin_edges,
                self.names,
                self.right,
                self.include_both_endpoints,
                self.nan_bin,
            )
        )

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"BinningSpec(bin_edges={list(self.bin_edges)}, names={self.names}, "
            f"right={self.right}, "
            f"include_both_endpoints={self.include_both_endpoints}, "
            f"nan_bin={self.nan_bin})"
        )

    # ------------------------------------------------------------------
    def to_column(self, column: str) -> Column:
        """Compile this binning to a pure Catalyst expression (no UDF).

        Builds a CASE WHEN chain: NaN -> nan_bin, then one branch per bin in
        order. Stays inside whole-stage codegen; at 100 TB this is just
        another projected expression on the scan.
        """
        c = F.col(column)
        edges, names = self.bin_edges, self.names
        lits = [F.lit(n) if n is not None else F.lit(None) for n in names]
        expr: Optional[Column] = None

        def when(cond: Column, value: Column) -> Column:
            nonlocal expr
            expr = F.when(cond, value) if expr is None else expr.when(cond, value)
            return expr

        if self._input_type is ColumnType.DECIMAL:
            when(F.isnan(c), F.lit(self.nan_bin))
        if self.right:
            if self.include_both_endpoints:
                when(c == F.lit(edges[0]), lits[0])
            for i in range(len(names)):
                when(
                    (c > F.lit(edges[i])) & (c <= F.lit(edges[i + 1])), lits[i]
                )
        else:
            if self.include_both_endpoints:
                when(c == F.lit(edges[-1]), lits[-1])
            for i in range(len(names)):
                when(
                    (c >= F.lit(edges[i])) & (c < F.lit(edges[i + 1])), lits[i]
                )
        assert expr is not None
        return expr.otherwise(F.lit(None))
