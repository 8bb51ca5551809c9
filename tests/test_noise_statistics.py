"""Statistical validation of the noise mechanisms (SURVEY §5: the
reference has no distributional tests; we add them). Numpy-level checks
use n large enough that the stated tolerances are >5 sigma — flake
probability is negligible. One end-to-end test measures the noise
actually attached to a Spark query across 3000 groups in a single job."""

import math

import numpy as np
import pandas as pd
import pytest

from tumult_analytics_spark.functions.noise import (
    _rng,
    _sample_discrete_gaussian,
    _sample_two_sided_geometric,
)

N = 400_000


def test_two_sided_geometric_moments():
    b = 2.0  # scale = d/eps
    x = _sample_two_sided_geometric(_rng(), b, N)
    assert x.dtype == np.int64
    # mean 0; variance = 2(1-p)/p^2 with p = 1 - exp(-1/b)
    p = 1.0 - math.exp(-1.0 / b)
    var = 2.0 * (1.0 - p) / p**2
    assert abs(x.mean()) < 5 * math.sqrt(var / N)
    assert abs(x.var() / var - 1.0) < 0.05


def test_two_sided_geometric_pmf_ratio():
    # P(k)/P(0) must equal exp(-|k|/b): the defining DP property.
    b = 1.0
    x = _sample_two_sided_geometric(_rng(), b, N)
    counts = {k: int((x == k).sum()) for k in (0, 1, 2, 3)}
    for k in (1, 2, 3):
        expected = math.exp(-k / b)
        observed = counts[k] / counts[0]
        assert abs(observed / expected - 1.0) < 0.1, (k, observed, expected)


def test_discrete_gaussian_moments():
    sigma = 3.0
    x = _sample_discrete_gaussian(_rng(), sigma * sigma, N)
    assert x.dtype == np.int64
    # Discrete Gaussian variance -> sigma^2 (within ~1% for sigma >= 1).
    assert abs(x.mean()) < 5 * sigma / math.sqrt(N)
    assert abs(x.var() / sigma**2 - 1.0) < 0.05


def test_discrete_gaussian_pmf_ratio():
    sigma = 2.0
    x = _sample_discrete_gaussian(_rng(), sigma * sigma, N)
    c0 = int((x == 0).sum())
    for k in (1, 2, 3):
        expected = math.exp(-(k * k) / (2 * sigma * sigma))
        observed = int((x == k).sum()) / c0
        assert abs(observed / expected - 1.0) < 0.1, (k, observed, expected)


def test_independent_draws_across_batches():
    # Two draws from the module RNG must not repeat (seeding pitfall:
    # identically-seeded partitions would produce correlated noise).
    a = _sample_two_sided_geometric(_rng(), 5.0, 1000)
    b = _sample_two_sided_geometric(_rng(), 5.0, 1000)
    assert not np.array_equal(a, b)


def test_end_to_end_noise_scale(spark):
    # One query over 3000 keyset groups at eps=1, sensitivity 1:
    # per-group geometric noise with b=1 -> std = sqrt(2(1-p)/p^2).
    from tumult_analytics_spark import (
        AddOneRow,
        KeySet,
        PureDPBudget,
        QueryBuilder,
        Session,
    )

    groups = list(range(3000))
    df = spark.createDataFrame(pd.DataFrame({"g": groups, "x": groups}))
    s = Session.from_dataframe(PureDPBudget(1), "t", df, AddOneRow())
    ks = KeySet.from_dict({"g": groups})
    out = s.evaluate(QueryBuilder("t").groupby(ks).count(), PureDPBudget(1))
    noise = np.array([r["count"] - 1 for r in out.collect()], dtype=np.float64)
    p = 1.0 - math.exp(-1.0)
    var = 2.0 * (1.0 - p) / p**2
    assert abs(noise.mean()) < 5 * math.sqrt(var / len(noise))
    assert abs(noise.var() / var - 1.0) < 0.2
    # integrality: counts stay integers under the geometric mechanism
    assert all(float(v).is_integer() for v in noise)


def test_quantile_exponential_mechanism_concentrates(spark):
    # At eps=5 with 2000 rows, the DP median of uniform [0, 100] data
    # should land near 50 with high probability; repeated draws vary.
    from tumult_analytics_spark import (
        AddOneRow,
        PureDPBudget,
        QueryBuilder,
        Session,
    )

    df = spark.range(2000).selectExpr("cast(id % 100 as double) as x")
    s = Session.from_dataframe(PureDPBudget(100), "t", df, AddOneRow())
    meds = [
        s.evaluate(
            QueryBuilder("t").median("x", 0, 100, name="m"), PureDPBudget(5)
        ).collect()[0]["m"]
        for _ in range(3)
    ]
    for m in meds:
        assert 30 <= m <= 70, meds
    assert len(set(meds)) > 1, f"DP quantile must vary across draws: {meds}"
