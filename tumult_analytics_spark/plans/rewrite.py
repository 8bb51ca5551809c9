"""Privacy rewrite rules applied before compilation.

Fresh implementation of the pipeline at
``/root/reference/src/tmlt/analytics/_query_expr_compiler/_rewrite_rules.py``:

1. ``add_special_value_handling`` (:202-257): numeric aggregations whose
   measure column may contain null/NaN get a DropNullAndNan spliced under
   them; columns that may contain ±inf get ReplaceInfinity clamped to the
   aggregation bounds (DropInfinity for GetBounds).
2. Noise-mechanism selection (:91-199) is resolved at measurement-compile
   time (`compiler.resolve_mechanism`) since it depends only on the budget
   kind and measure column type.

Catalyst never does rule 1 — it changes query semantics and exists for
privacy reasons, so it lives here, driver-side, over the logical tree.
"""

from __future__ import annotations

from typing import Mapping

from ..schema import ColumnType, Schema
from . import expr as E


def _wrap_measure_child(
    expr, catalog: Mapping[str, Schema], drop_inf: bool = False
):
    """Splice special-value handling under a numeric aggregation node."""
    child = rewrite(expr.child, catalog)
    cs = child.schema(catalog)
    col = expr.measure_column
    desc = cs[col]
    if desc.allow_null or desc.allow_nan:
        child = E.DropNullAndNan(child, (col,))
    if desc.allow_inf:
        if drop_inf:
            child = E.DropInfinity(child, (col,))
        else:
            child = E.ReplaceInfinity(
                child, ((col, (float(expr.low), float(expr.high))),)
            )
    return child


def rewrite(expr: E.QueryExpr, catalog: Mapping[str, Schema]) -> E.QueryExpr:
    """Apply the rewrite pipeline depth-first, returning a new tree."""
    import dataclasses

    if isinstance(
        expr,
        (
            E.GroupByBoundedSum,
            E.GroupByBoundedAverage,
            E.GroupByBoundedVariance,
            E.GroupByBoundedStdev,
            E.GroupByQuantile,
        ),
    ):
        return dataclasses.replace(expr, child=_wrap_measure_child(expr, catalog))
    if isinstance(expr, E.GetBounds):
        child = rewrite(expr.child, catalog)
        cs = child.schema(catalog)
        desc = cs[expr.measure_column]
        if desc.allow_null or desc.allow_nan:
            child = E.DropNullAndNan(child, (expr.measure_column,))
        if desc.allow_inf:
            child = E.DropInfinity(child, (expr.measure_column,))
        return dataclasses.replace(expr, child=child)
    if isinstance(expr, E.SuppressAggregates):
        return dataclasses.replace(expr, child=rewrite(expr.child, catalog))
    if isinstance(expr, (E.GroupByCount, E.GroupByCountDistinct, E.GetGroups)):
        return dataclasses.replace(expr, child=rewrite(expr.child, catalog))
    # Transformation nodes: rewrite children recursively.
    if isinstance(expr, E.JoinPrivate):
        return dataclasses.replace(
            expr,
            left_child=rewrite(expr.left_child, catalog),
            right_child=rewrite(expr.right_child, catalog),
        )
    if hasattr(expr, "child"):
        return dataclasses.replace(expr, child=rewrite(expr.child, catalog))
    return expr
