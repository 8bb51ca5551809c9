"""tumult_analytics_spark: a PySpark-native differentially-private analytics
engine with the query surface of opendp/tumult-analytics, rebuilt Spark-first.

Public API mirrors the reference's exports
(`/root/reference/src/tmlt/analytics/__init__.py:41-84`).
"""

from .binning import BinningSpec, BinT
from .budget import ApproxDPBudget, PrivacyBudget, PureDPBudget, RhoZCDPBudget
from .config import Config, FeatureFlag
from .builder import GroupbyCountQuery, GroupedQueryBuilder, Query, QueryBuilder
from .constraints import (
    Constraint,
    MaxGroupsPerID,
    MaxRowsPerGroupPerID,
    MaxRowsPerID,
    TruncationStrategy,
)
from .keyset import KeySet
from .plans.expr import (
    AverageMechanism,
    CountDistinctMechanism,
    CountMechanism,
    Row,
    StdevMechanism,
    SumMechanism,
    VarianceMechanism,
)
from .protected import (
    AddMaxRows,
    AddMaxRowsInMaxGroups,
    AddOneRow,
    AddRowsWithID,
    ProtectedChange,
)
from .schema import (
    AnalyticsDefault,
    AnalyticsInternalError,
    ColumnDescriptor,
    ColumnType,
    Schema,
)
from .session import Session

__all__ = [
    "AnalyticsDefault",
    "AnalyticsInternalError",
    "ApproxDPBudget",
    "AverageMechanism",
    "AddMaxRows",
    "AddMaxRowsInMaxGroups",
    "AddOneRow",
    "AddRowsWithID",
    "BinningSpec",
    "BinT",
    "ColumnDescriptor",
    "Config",
    "FeatureFlag",
    "ColumnType",
    "Constraint",
    "CountDistinctMechanism",
    "CountMechanism",
    "GroupbyCountQuery",
    "GroupedQueryBuilder",
    "KeySet",
    "MaxGroupsPerID",
    "MaxRowsPerGroupPerID",
    "MaxRowsPerID",
    "PrivacyBudget",
    "ProtectedChange",
    "PureDPBudget",
    "Query",
    "QueryBuilder",
    "RhoZCDPBudget",
    "Row",
    "Schema",
    "Session",
    "StdevMechanism",
    "SumMechanism",
    "TruncationStrategy",
    "VarianceMechanism",
]

__version__ = "0.1.0"
