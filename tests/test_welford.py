"""Welford/Chan merge precision for the out-of-sample evaluator.

Reference: evaluate.c:86-93 uses a scalar Welford update.  The batched
evaluator merges per-batch (mean, M2) statistics with welford_merge; this
must stay accurate at storm-class magnitudes (recourse values ~1.5e7 with
comparatively tiny variance) where naive sum/sum-of-squares accumulation
loses ~8 digits to cancellation in f64.
"""

import numpy as np

from stochasticdecomposition_tpu.core.evaluate import welford_merge


def _merge_stream(batches):
    n, mean, M2 = 0, 0.0, 0.0
    for b in batches:
        nb = len(b)
        mb = float(np.mean(b)) if nb else 0.0
        m2b = float(np.sum((b - mb) ** 2)) if nb else 0.0
        n, mean, M2 = welford_merge(n, mean, M2, nb, mb, m2b)
    return n, mean, M2


def test_storm_magnitude_variance_precision():
    # mean ~1.5e7, stdev ~1e-2: sumsq - n*mean^2 cancels ~18 digits and is
    # garbage in f64; the Welford merge must stay accurate.
    rng = np.random.default_rng(0)
    data = 1.5e7 + 1e-2 * rng.standard_normal(100_000)
    batches = np.split(data, 200)

    n, mean, M2 = _merge_stream(batches)
    assert n == len(data)
    var = M2 / (n - 1)

    ref_mean = np.mean(data)
    ref_var = np.var(data, ddof=1)
    assert abs(mean - ref_mean) <= 1e-9 * abs(ref_mean)
    assert abs(var - ref_var) <= 1e-6 * ref_var

    # Demonstrate the failure mode being guarded against: naive sumsq.
    tot = sum(float(np.sum(b)) for b in batches)
    totsq = sum(float(np.sum(b * b)) for b in batches)
    naive_var = (totsq - n * (tot / n) ** 2) / (n - 1)
    assert abs(naive_var - ref_var) > 1e3 * ref_var or naive_var <= 0


def test_merge_matches_flat_welford():
    # Uneven batch sizes, including empty batches (all lanes dropped).
    rng = np.random.default_rng(1)
    data = rng.standard_normal(1000) * 3.0 + 7.0
    sizes = [0, 1, 17, 250, 2, 0, 500, 230]
    assert sum(sizes) == len(data)
    batches, i = [], 0
    for s in sizes:
        batches.append(data[i:i + s])
        i += s
    n, mean, M2 = _merge_stream(batches)
    assert n == len(data)
    np.testing.assert_allclose(mean, np.mean(data), rtol=1e-12)
    np.testing.assert_allclose(M2 / (n - 1), np.var(data, ddof=1), rtol=1e-10)
