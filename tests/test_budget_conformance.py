"""Budget class conformance, ported from the reference's
test/unit/test_privacy_budget.py: constructor validation, infinity
semantics, cross-kind and infinite-budget equality, hashing. No Spark
needed — pure driver-side arithmetic.
"""

import pytest

from tumult_analytics_spark import (
    ApproxDPBudget,
    PureDPBudget,
    RhoZCDPBudget,
)

INF = float("inf")


class TestConstructors:
    @pytest.mark.parametrize("v", [0, 3, 0.5, INF])
    def test_puredp_ok(self, v):
        PureDPBudget(v)

    @pytest.mark.parametrize("v", [-1, -0.5])
    def test_puredp_negative(self, v):
        with pytest.raises(ValueError):
            PureDPBudget(v)

    def test_puredp_nan(self):
        with pytest.raises(ValueError):
            PureDPBudget(float("nan"))

    def test_puredp_bad_type(self):
        with pytest.raises((TypeError, ValueError)):
            PureDPBudget("not a number")

    @pytest.mark.parametrize("eps,delta", [(1, 0.1), (0, 0), (INF, 1), (1, 1)])
    def test_approxdp_ok(self, eps, delta):
        ApproxDPBudget(eps, delta)

    @pytest.mark.parametrize(
        "eps,delta", [(-1, 0.1), (1, -0.1), (1, 1.5), (1, float("nan"))]
    )
    def test_approxdp_invalid(self, eps, delta):
        with pytest.raises(ValueError):
            ApproxDPBudget(eps, delta)

    @pytest.mark.parametrize("v", [-1, float("nan")])
    def test_zcdp_invalid(self, v):
        with pytest.raises(ValueError):
            RhoZCDPBudget(v)


class TestIsInfinite:
    @pytest.mark.parametrize(
        "budget,expected",
        [
            (PureDPBudget(INF), True),
            (PureDPBudget(5), False),
            (ApproxDPBudget(INF, 0), True),
            (ApproxDPBudget(1, 1), True),  # delta = 1 -> no privacy
            (ApproxDPBudget(1, 0.5), False),
            (RhoZCDPBudget(INF), True),
            (RhoZCDPBudget(5), False),
        ],
    )
    def test_cases(self, budget, expected):
        assert budget.is_infinite() is expected


# The reference's equality matrix (test_privacy_budget.py:285-345),
# minus the ExactNumber input rows (we accept int/float/Fraction).
EQUALITY_CASES = [
    (PureDPBudget(1), PureDPBudget(1), True),
    (PureDPBudget(1), PureDPBudget(2), False),
    (PureDPBudget(1), ApproxDPBudget(1, 1e-10), False),
    (PureDPBudget(1), RhoZCDPBudget(1), False),
    (PureDPBudget(1), ApproxDPBudget(1, 0), False),
    (ApproxDPBudget(1, 1e-10), ApproxDPBudget(1, 1e-10), True),
    (ApproxDPBudget(1, 1e-10), ApproxDPBudget(2, 1e-10), False),
    (ApproxDPBudget(1, 1e-10), ApproxDPBudget(1, 1e-11), False),
    (ApproxDPBudget(1, 1e-10), PureDPBudget(1), False),
    (ApproxDPBudget(1, 1e-10), RhoZCDPBudget(1), False),
    (ApproxDPBudget(1, 0), PureDPBudget(1), False),
    (RhoZCDPBudget(1), RhoZCDPBudget(1), True),
    (RhoZCDPBudget(1), RhoZCDPBudget(2), False),
    (RhoZCDPBudget(1), PureDPBudget(1), False),
    (RhoZCDPBudget(1), ApproxDPBudget(1, 1e-10), False),
    (PureDPBudget(INF), PureDPBudget(INF), True),
    (PureDPBudget(1), PureDPBudget(INF), False),
    (PureDPBudget(INF), PureDPBudget(1), False),
    (ApproxDPBudget(INF, 1), ApproxDPBudget(INF, 1), True),
    (ApproxDPBudget(1, 1), ApproxDPBudget(INF, 1), True),
    (ApproxDPBudget(INF, 1), ApproxDPBudget(1, 1), True),
    (ApproxDPBudget(0, 1), ApproxDPBudget(INF, 1), True),
    (ApproxDPBudget(INF, 1), ApproxDPBudget(0, 1), True),
    (RhoZCDPBudget(INF), RhoZCDPBudget(INF), True),
    (RhoZCDPBudget(1), RhoZCDPBudget(INF), False),
    (RhoZCDPBudget(INF), RhoZCDPBudget(1), False),
    (PureDPBudget(1), PureDPBudget(1.0), True),
    (PureDPBudget(1), PureDPBudget(1.1), False),
    (ApproxDPBudget(1, 1e-10), ApproxDPBudget(1.0, 1e-11), False),
    (ApproxDPBudget(1.1, 1e-10), ApproxDPBudget(1.0, 1e-10), False),
    (RhoZCDPBudget(1), RhoZCDPBudget(1.0), True),
    (RhoZCDPBudget(1), RhoZCDPBudget(1.1), False),
]


@pytest.mark.parametrize("a,b,equal", EQUALITY_CASES)
def test_budget_equality(a, b, equal):
    assert (a == b) is equal
    assert (b == a) is equal
    if equal:
        assert hash(a) == hash(b)


def test_budgets_usable_as_dict_keys():
    d = {
        PureDPBudget(1): "pure",
        ApproxDPBudget(1, 0): "approx",
        RhoZCDPBudget(1): "zcdp",
    }
    assert len(d) == 3
    assert d[PureDPBudget(1.0)] == "pure"
    # All infinite ApproxDP budgets collapse to one key.
    d2 = {ApproxDPBudget(1, 1): "inf"}
    assert d2[ApproxDPBudget(INF, 0.5)] == "inf"
