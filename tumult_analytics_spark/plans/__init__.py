"""Logical plan (QueryExpr) nodes, rewrite rules, and the Spark compiler."""

from .expr import *  # noqa: F401,F403
