"""Statistical helpers: Fisher-transform p-values and BH FDR correction.

Mirrors the reference ``chromosight/utils/stats.py``.  The device pipeline
computes p-values inline inside the fused normxcorr kernel
(``ops/normxcorr.py``); these host versions serve the public API and the
final q-value pass over the pattern table.
"""

from __future__ import annotations

import numpy as np
import scipy.stats as ss


def fdr_correction(pvals):
    """Benjamini-Hochberg adjusted p-values (matches R ``p.adjust``).

    Reference: ``stats.py:7-40``.
    """
    if pvals is None:
        return None
    pvals = np.array(pvals, dtype=np.float64)
    desc = pvals.argsort()[::-1]
    back = desc.argsort()
    steps = float(len(pvals)) / np.arange(len(pvals), 0, -1)
    qvals = np.minimum(1, np.minimum.accumulate(steps * pvals[desc]))
    return qvals[back]


def corr_to_pval(corr, n, rho0=0):
    """Two-sided log10 p-values for Pearson coefficients via the Fisher
    z-transformation.

    Reference: ``stats.py:43-81``.
    """
    corr = np.asarray(corr, dtype=np.float64)
    if isinstance(n, (int, np.integer)):
        n = np.full(corr.shape, n, dtype=np.float64)
    else:
        n = np.asarray(n, dtype=np.float64)
        if n.shape != corr.shape:
            raise ValueError("corr and n must have identical shapes.")
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.arctanh(corr) - np.arctanh(rho0)
        pvals = 2 * ss.norm().cdf(-np.abs(z * np.sqrt(n - 3)))
        return np.log10(pvals)
