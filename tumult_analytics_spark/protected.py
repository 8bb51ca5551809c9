"""Protected-change declarations.

Fresh implementation of the four ProtectedChange kinds documented at
``/root/reference/src/tmlt/analytics/protected_change.py:24-150``. These
declare the unit of protection for a private table and determine the initial
stability (d_in) of the table in the privacy analysis.
"""

from __future__ import annotations

import math
from abc import ABC
from dataclasses import dataclass


class ProtectedChange(ABC):
    """What one individual can change in a private table."""


@dataclass(frozen=True)
class AddMaxRows(ProtectedChange):
    """Protects addition/removal of up to ``max_rows`` rows."""

    max_rows: int

    def __post_init__(self):
        if self.max_rows < 1:
            raise ValueError("max_rows must be a positive integer")


@dataclass(frozen=True)
class AddOneRow(AddMaxRows):
    """Protects addition/removal of a single row."""

    max_rows: int = 1


@dataclass(frozen=True)
class AddMaxRowsInMaxGroups(ProtectedChange):
    """Protects up to ``max_rows_per_group`` rows in up to ``max_groups``
    distinct values of ``grouping_column``.

    Stability (reference _neighboring_relation_visitor.py:118-140):
    L1 = max_groups * max_rows_per_group; L2 = sqrt(max_groups) *
    max_rows_per_group (used under zCDP when grouped on the column).
    """

    grouping_column: str
    max_groups: int
    max_rows_per_group: int

    def __post_init__(self):
        if self.max_groups < 1 or self.max_rows_per_group < 1:
            raise ValueError("max_groups and max_rows_per_group must be positive")

    @property
    def l1_stability(self) -> int:
        return self.max_groups * self.max_rows_per_group

    @property
    def l2_stability(self) -> float:
        return math.sqrt(self.max_groups) * self.max_rows_per_group


@dataclass(frozen=True)
class AddRowsWithID(ProtectedChange):
    """Protects all rows sharing one value of ``id_column``.

    Tables registered with the same ``id_space`` share a privacy-ID domain
    and may be privately joined without truncation.
    """

    id_column: str
    id_space: str = "default_id_space"
