"""Driver-side conformance batteries ported from the reference's unit
tests (no Spark session needed): protected-change construction
(test_protected_change.py) and constraint simplification
(test_constraints.py:55-161, full case matrix).
"""

import pytest

from tumult_analytics_spark import (
    AddMaxRows,
    AddMaxRowsInMaxGroups,
    AddOneRow,
    AddRowsWithID,
    MaxGroupsPerID,
    MaxRowsPerGroupPerID,
    MaxRowsPerID,
)
from tumult_analytics_spark.constraints import simplify_constraints


class TestProtectedChanges:
    def test_add_one_row_is_add_max_rows_1(self):
        assert isinstance(AddOneRow(), AddMaxRows)
        assert AddOneRow().max_rows == 1

    @pytest.mark.parametrize("n", [1, 5])
    def test_add_max_rows_ok(self, n):
        AddMaxRows(n)

    @pytest.mark.parametrize("n", [0, -1])
    def test_add_max_rows_nonpositive(self, n):
        with pytest.raises(ValueError):
            AddMaxRows(n)

    def test_add_max_rows_in_max_groups(self):
        AddMaxRowsInMaxGroups("x", 10, 2)
        with pytest.raises(ValueError):
            AddMaxRowsInMaxGroups("x", 0, 1)
        with pytest.raises(ValueError):
            AddMaxRowsInMaxGroups("x", 1, 0)

    def test_add_rows_with_id(self):
        pc = AddRowsWithID("uid")
        assert pc.id_column == "uid"


# Full simplify matrix from the reference (column names shortened).
SIMPLIFY_CASES = [
    ([], []),
    ([MaxRowsPerID(1)], [MaxRowsPerID(1)]),
    ([MaxRowsPerID(1), MaxRowsPerID(1)], [MaxRowsPerID(1)]),
    ([MaxRowsPerID(1), MaxRowsPerID(5)], [MaxRowsPerID(1)]),
    ([MaxRowsPerID(3), MaxRowsPerID(2), MaxRowsPerID(6)], [MaxRowsPerID(2)]),
    (
        [MaxGroupsPerID("g", 1), MaxGroupsPerID("g", 5)],
        [MaxGroupsPerID("g", 1)],
    ),
    (
        [MaxGroupsPerID("g", 1), MaxGroupsPerID("o", 5), MaxGroupsPerID("g", 3)],
        [MaxGroupsPerID("g", 1), MaxGroupsPerID("o", 5)],
    ),
    (
        [MaxRowsPerID(1), MaxGroupsPerID("g", 1)],
        [MaxRowsPerID(1), MaxGroupsPerID("g", 1)],
    ),
    (
        [MaxRowsPerID(1), MaxGroupsPerID("g", 1), MaxRowsPerID(5)],
        [MaxRowsPerID(1), MaxGroupsPerID("g", 1)],
    ),
    (
        [
            MaxRowsPerID(1),
            MaxGroupsPerID("g", 1),
            MaxGroupsPerID("g", 5),
            MaxGroupsPerID("o", 1),
        ],
        [MaxRowsPerID(1), MaxGroupsPerID("g", 1), MaxGroupsPerID("o", 1)],
    ),
    (
        [MaxRowsPerGroupPerID("gc", 1)],
        [MaxRowsPerGroupPerID("gc", 1)],
    ),
    (
        [MaxRowsPerGroupPerID("gc", 1), MaxRowsPerGroupPerID("gc", 1)],
        [MaxRowsPerGroupPerID("gc", 1)],
    ),
    (
        [MaxRowsPerGroupPerID("gc", 3), MaxRowsPerGroupPerID("gc", 6)],
        [MaxRowsPerGroupPerID("gc", 3)],
    ),
    (
        [
            MaxRowsPerGroupPerID("g1", 1),
            MaxRowsPerGroupPerID("g2", 1),
            MaxRowsPerGroupPerID("g2", 5),
        ],
        [MaxRowsPerGroupPerID("g1", 1), MaxRowsPerGroupPerID("g2", 1)],
    ),
    (
        [
            MaxRowsPerGroupPerID("g1", 1),
            MaxGroupsPerID("g1", 1),
            MaxRowsPerID(1),
        ],
        [
            MaxRowsPerGroupPerID("g1", 1),
            MaxGroupsPerID("g1", 1),
            MaxRowsPerID(1),
        ],
    ),
    (
        [
            MaxRowsPerID(1),
            MaxRowsPerID(2),
            MaxRowsPerGroupPerID("g1", 1),
            MaxRowsPerGroupPerID("g2", 2),
            MaxGroupsPerID("g1", 1),
            MaxGroupsPerID("g1", 5),
        ],
        [
            MaxRowsPerID(1),
            MaxRowsPerGroupPerID("g1", 1),
            MaxRowsPerGroupPerID("g2", 2),
            MaxGroupsPerID("g1", 1),
        ],
    ),
]


@pytest.mark.parametrize("constraints,expected", SIMPLIFY_CASES)
def test_simplify_constraints(constraints, expected):
    got = simplify_constraints(list(constraints))
    assert sorted(map(repr, got)) == sorted(map(repr, expected))
