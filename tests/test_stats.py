"""Statistics tests (mirrors reference tests/test_stats.py, which checks BH
values against R's p.adjust)."""

import numpy as np

from chromosight_tpu.stats import corr_to_pval, fdr_correction


def test_fdr_matches_r_p_adjust():
    # Same oracle values as the reference test (R p.adjust, method="BH")
    pvals = np.array([0.01, 0.04, 0.03, 0.005])
    expected = np.array([0.02, 0.04, 0.04, 0.02])
    assert np.allclose(fdr_correction(pvals), expected)


def test_fdr_monotone_bounded():
    rng = np.random.RandomState(0)
    pvals = rng.rand(100)
    qvals = fdr_correction(pvals)
    assert np.all(qvals <= 1) and np.all(qvals >= pvals - 1e-12)


def test_fdr_none():
    assert fdr_correction(None) is None


def test_corr_to_pval_scalar_n():
    corr = np.array([0.0, 0.5, 0.9, -0.9])
    logp = corr_to_pval(corr, 100)
    p = 10**logp
    assert p[0] == 1.0
    assert p[2] < p[1] < p[0]
    assert np.isclose(p[2], p[3])


def test_corr_to_pval_array_n():
    corr = np.array([0.5, 0.5])
    logp = corr_to_pval(corr, np.array([10, 1000]))
    # more observations -> smaller p-value
    assert logp[1] < logp[0]


def test_corr_to_pval_matches_fisher():
    import scipy.stats as ss

    r, n = 0.42, 50
    z = np.arctanh(r)
    expected = np.log10(2 * ss.norm.cdf(-abs(z) * np.sqrt(n - 3)))
    got = corr_to_pval(np.array([r]), n)[0]
    assert np.isclose(got, expected)
