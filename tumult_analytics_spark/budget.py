"""Privacy budgets with exact rational arithmetic.

Fresh implementation of the semantics at
``/root/reference/src/tmlt/analytics/privacy_budget.py:47-558``: three budget
kinds (PureDP epsilon, ApproxDP (epsilon, delta), RhoZCDP rho), exact
arithmetic (we use ``fractions.Fraction`` instead of sympy), infinity support,
and the "requested budget slightly above remaining" tolerance fix-up
(privacy_budget.py:512-558).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from fractions import Fraction
from typing import Tuple, Union

Numeric = Union[int, float, Fraction]

#: Relative tolerance used when a requested budget is slightly above the
#: remaining budget due to float imprecision (reference fix-up behavior).
_BUDGET_RELATIVE_TOLERANCE = Fraction(1, 10**9)


def _to_frac(value: Numeric, name: str) -> Union[Fraction, float]:
    """Exact rational, or +inf (the only non-finite value allowed)."""
    if isinstance(value, float):
        if value == float("inf"):
            return float("inf")
        if value != value:  # NaN
            raise ValueError(f"{name} cannot be NaN")
    if isinstance(value, (int, Fraction)) or isinstance(value, float):
        frac = Fraction(value)
        if frac < 0:
            raise ValueError(f"{name} must be non-negative, got {value}")
        return frac
    raise TypeError(f"{name} must be numeric, got {type(value).__name__}")


def _is_inf(x) -> bool:
    return isinstance(x, float) and x == float("inf")


def _fmt(x) -> str:
    if _is_inf(x):
        return "inf"
    f = Fraction(x)
    return str(int(f)) if f.denominator == 1 else str(float(f))


class PrivacyBudget(ABC):
    """Base class for privacy budgets."""

    @abstractmethod
    def is_infinite(self) -> bool:
        ...

    @classmethod
    @abstractmethod
    def inf(cls) -> "PrivacyBudget":
        ...

    @abstractmethod
    def __add__(self, other: "PrivacyBudget") -> "PrivacyBudget":
        ...

    @abstractmethod
    def __sub__(self, other: "PrivacyBudget") -> "PrivacyBudget":
        ...

    def can_afford(self, requested: "PrivacyBudget") -> bool:
        try:
            self.subtract(requested)
            return True
        except ValueError:
            return False

    @abstractmethod
    def subtract(self, requested: "PrivacyBudget") -> "PrivacyBudget":
        """Remaining budget after spending ``requested`` (with tolerance)."""


def _spend(remaining, requested, name: str):
    """Exact subtract with the slight-overdraft tolerance fix-up."""
    if _is_inf(remaining):
        return remaining
    if _is_inf(requested):
        raise ValueError(f"Cannot spend infinite {name} from a finite budget")
    if requested <= remaining:
        return remaining - requested
    if remaining > 0 and requested - remaining <= remaining * _BUDGET_RELATIVE_TOLERANCE:
        return Fraction(0)
    # RuntimeError, matching the reference's "Cannot answer query without
    # exceeding the Session privacy budget" (session.py:772, 1142).
    raise RuntimeError(
        f"Cannot answer query without exceeding the Session privacy budget: "
        f"requested {name}={_fmt(requested)}, only {_fmt(remaining)} remaining"
    )


class PureDPBudget(PrivacyBudget):
    """Pure differential privacy: epsilon."""

    def __init__(self, epsilon: Numeric):
        self._epsilon = _to_frac(epsilon, "epsilon")

    @property
    def epsilon(self):
        return self._epsilon

    def is_infinite(self) -> bool:
        return _is_inf(self._epsilon)

    @classmethod
    def inf(cls) -> "PureDPBudget":
        return cls(float("inf"))

    def __add__(self, other):
        self._check(other)
        if self.is_infinite() or other.is_infinite():
            return PureDPBudget.inf()
        return PureDPBudget(self._epsilon + other._epsilon)

    def __sub__(self, other):
        return self.subtract(other)

    def subtract(self, requested):
        self._check(requested)
        return PureDPBudget(_spend(self._epsilon, requested._epsilon, "epsilon"))

    def _check(self, other):
        if not isinstance(other, PureDPBudget):
            raise TypeError(
                f"Expected PureDPBudget, got {type(other).__name__}"
            )

    def __truediv__(self, k: Numeric) -> "PureDPBudget":
        if self.is_infinite():
            return PureDPBudget.inf()
        return PureDPBudget(self._epsilon / Fraction(k))

    def __mul__(self, k: Numeric) -> "PureDPBudget":
        if self.is_infinite():
            return PureDPBudget.inf()
        return PureDPBudget(self._epsilon * Fraction(k))

    def __eq__(self, other):
        return isinstance(other, PureDPBudget) and self._epsilon == other._epsilon

    def __hash__(self):
        return hash(("PureDP", self._epsilon))

    def __repr__(self):
        return f"PureDPBudget(epsilon={_fmt(self._epsilon)})"


class ApproxDPBudget(PrivacyBudget):
    """Approximate differential privacy: (epsilon, delta)."""

    def __init__(self, epsilon: Numeric, delta: Numeric):
        self._epsilon = _to_frac(epsilon, "epsilon")
        d = _to_frac(delta, "delta")
        if not _is_inf(d) and d > 1:
            raise ValueError("delta must be in [0, 1]")
        self._delta = Fraction(1) if _is_inf(d) else d

    @property
    def epsilon(self):
        return self._epsilon

    @property
    def delta(self):
        return self._delta

    def is_infinite(self) -> bool:
        return _is_inf(self._epsilon) or self._delta >= 1

    @classmethod
    def inf(cls) -> "ApproxDPBudget":
        return cls(float("inf"), 1)

    def __add__(self, other):
        self._check(other)
        if self.is_infinite() or other.is_infinite():
            return ApproxDPBudget.inf()
        return ApproxDPBudget(
            self._epsilon + other._epsilon, min(self._delta + other._delta, Fraction(1))
        )

    def __sub__(self, other):
        return self.subtract(other)

    def subtract(self, requested):
        self._check(requested)
        if self.is_infinite():
            return ApproxDPBudget.inf()
        eps = _spend(self._epsilon, requested._epsilon, "epsilon")
        delta = _spend(self._delta, requested._delta, "delta")
        return ApproxDPBudget(eps, delta)

    def _check(self, other):
        if not isinstance(other, ApproxDPBudget):
            raise TypeError(f"Expected ApproxDPBudget, got {type(other).__name__}")

    def __truediv__(self, k: Numeric) -> "ApproxDPBudget":
        if self.is_infinite():
            return ApproxDPBudget.inf()
        return ApproxDPBudget(self._epsilon / Fraction(k), self._delta / Fraction(k))

    def __mul__(self, k: Numeric) -> "ApproxDPBudget":
        if self.is_infinite():
            return ApproxDPBudget.inf()
        return ApproxDPBudget(
            self._epsilon * Fraction(k), min(self._delta * Fraction(k), Fraction(1))
        )

    def __eq__(self, other):
        if not isinstance(other, ApproxDPBudget):
            return False
        # All infinite ApproxDP budgets are equal (reference
        # privacy_budget.py equality: (1, 1), (inf, 0.1), (0, 1), ...
        # all denote "no privacy" and compare True).
        if self.is_infinite() and other.is_infinite():
            return True
        return self._epsilon == other._epsilon and self._delta == other._delta

    def __hash__(self):
        if self.is_infinite():
            return hash(("ApproxDP", "inf"))
        return hash(("ApproxDP", self._epsilon, self._delta))

    def __repr__(self):
        return (
            f"ApproxDPBudget(epsilon={_fmt(self._epsilon)}, delta={_fmt(self._delta)})"
        )


class RhoZCDPBudget(PrivacyBudget):
    """Zero-concentrated differential privacy: rho."""

    def __init__(self, rho: Numeric):
        self._rho = _to_frac(rho, "rho")

    @property
    def rho(self):
        return self._rho

    def is_infinite(self) -> bool:
        return _is_inf(self._rho)

    @classmethod
    def inf(cls) -> "RhoZCDPBudget":
        return cls(float("inf"))

    def __add__(self, other):
        self._check(other)
        if self.is_infinite() or other.is_infinite():
            return RhoZCDPBudget.inf()
        return RhoZCDPBudget(self._rho + other._rho)

    def __sub__(self, other):
        return self.subtract(other)

    def subtract(self, requested):
        self._check(requested)
        return RhoZCDPBudget(_spend(self._rho, requested._rho, "rho"))

    def _check(self, other):
        if not isinstance(other, RhoZCDPBudget):
            raise TypeError(f"Expected RhoZCDPBudget, got {type(other).__name__}")

    def __truediv__(self, k: Numeric) -> "RhoZCDPBudget":
        if self.is_infinite():
            return RhoZCDPBudget.inf()
        return RhoZCDPBudget(self._rho / Fraction(k))

    def __mul__(self, k: Numeric) -> "RhoZCDPBudget":
        if self.is_infinite():
            return RhoZCDPBudget.inf()
        return RhoZCDPBudget(self._rho * Fraction(k))

    def __eq__(self, other):
        return isinstance(other, RhoZCDPBudget) and self._rho == other._rho

    def __hash__(self):
        return hash(("RhoZCDP", self._rho))

    def __repr__(self):
        return f"RhoZCDPBudget(rho={_fmt(self._rho)})"
