"""ICE (iterative correction) matrix balancing.

Replaces ``cooler.balance_cooler`` which the reference calls with
``mad_max=n_mads, cis_only=not inter, ignore_diags=2, max_iters=200,
min_nnz=10, store=True`` (reference ``contacts_map.py:209-219``).

Algorithm follows cooler's published iterative-correction procedure:

1. drop pixels on the first ``ignore_diags`` diagonals;
2. exclude bins with fewer than ``min_nnz`` nonzero pixels;
3. exclude bins whose log marginal falls more than ``mad_max`` scaled MADs
   below the median log marginal (MAD scaled by 1/0.6745 for normal
   consistency, as in cooler);
4. iterate  bias /= marginal(bias * A * bias) / mean  until the variance of
   the scaled nonzero marginals drops below ``tol``;
5. rescale biases by sqrt(mean marginal) so the balanced matrix has unit
   marginals; excluded bins get NaN weights.

``cis_only=True`` balances each chromosome block independently.
"""

from __future__ import annotations

import numpy as np


def _marginals(b1, b2, counts, bias, n_bins):
    """Marginal sums of the symmetric matrix given upper-triangle pixels."""
    from chromosight_tpu import native

    marg = native.marginal_sums(b1, b2, counts, bias, n_bins)
    if marg is not None:
        return marg
    vals = counts * bias[b1] * bias[b2]
    marg = np.bincount(b1, weights=vals, minlength=n_bins)
    marg += np.bincount(b2, weights=vals, minlength=n_bins)
    return marg


def _balance_block(b1, b2, counts, n_bins, offset, mad_max, min_nnz,
                   max_iters, tol, ignore_diags):
    """Balance one (cis) block. Bin ids are global; ``offset`` maps them to
    block-local indices. Returns (bias, scale, converged, n_iters)."""
    b1 = b1 - offset
    b2 = b2 - offset
    keep = (b2 - b1) >= ignore_diags
    b1, b2, counts = b1[keep], b2[keep], counts[keep].astype(np.float64)

    bias = np.ones(n_bins, dtype=np.float64)
    # min_nnz filter
    nnz = np.bincount(b1, minlength=n_bins) + np.bincount(
        b2, minlength=n_bins
    )
    bias[nnz < min_nnz] = 0.0
    # mad_max filter on log marginals
    if mad_max > 0:
        marg = _marginals(b1, b2, counts, bias, n_bins)
        nz = marg > 0
        if np.any(nz):
            log_marg = np.log(marg[nz])
            med = np.median(log_marg)
            dev = np.median(np.abs(log_marg - med)) / 0.6745
            cutoff = np.exp(med - mad_max * dev)
            bias[marg < cutoff] = 0.0

    scale = np.nan
    var = np.inf
    n_iter = 0
    for n_iter in range(max_iters):
        marg = _marginals(b1, b2, counts, bias, n_bins)
        nzmarg = marg[marg != 0]
        if len(nzmarg) == 0:
            break
        scale = nzmarg.mean()
        adj = marg / scale
        adj[adj == 0] = 1.0
        bias /= adj
        var = float(((nzmarg / scale) - 1).var())
        if var < tol:
            break
    converged = var < tol
    bias[bias == 0] = np.nan
    if np.isfinite(scale):
        bias /= np.sqrt(scale)
    return bias, scale, converged, n_iter + 1


def ice_balance(
    clr,
    mad_max=5,
    cis_only=True,
    ignore_diags=2,
    max_iters=200,
    min_nnz=10,
    tol=1e-5,
    chunksize=10_000_000,
    store=True,
):
    """Balance a cool file in place, writing the ``weight`` column.

    Parameters mirror the reference's cooler.balance_cooler invocation
    (``contacts_map.py:209-219``).
    """
    n_bins = clr.n_bins
    # Stream the pixel table once into memory (COO triplets). Genome-scale
    # 5 kb maps hold O(1e9) pixels ~ 24 GB; chunked accumulation of the
    # per-block triplets keeps peak usage bounded to the largest block.
    b1_l, b2_l, ct_l = [], [], []
    for b1, b2, ct in clr.pixel_chunks(chunksize):
        b1_l.append(b1)
        b2_l.append(b2)
        ct_l.append(ct)
    b1 = np.concatenate(b1_l) if b1_l else np.zeros(0, np.int64)
    b2 = np.concatenate(b2_l) if b2_l else np.zeros(0, np.int64)
    ct = np.concatenate(ct_l) if ct_l else np.zeros(0, np.float64)

    weights = np.full(n_bins, np.nan)
    stats = {"mad_max": mad_max, "min_nnz": min_nnz, "ignore_diags": ignore_diags}
    if cis_only:
        offsets = clr._chrom_offset
        for cid in range(len(offsets) - 1):
            s, e = int(offsets[cid]), int(offsets[cid + 1])
            sel = (b1 >= s) & (b1 < e) & (b2 >= s) & (b2 < e)
            bias, scale, converged, n_iter = _balance_block(
                b1[sel], b2[sel], ct[sel], e - s, s,
                mad_max, min_nnz, max_iters, tol, ignore_diags,
            )
            weights[s:e] = bias
    else:
        # trans-inclusive balancing uses all pixels genome-wide
        bias, scale, converged, n_iter = _balance_block(
            b1, b2, ct, n_bins, 0,
            mad_max, min_nnz, max_iters, tol, ignore_diags,
        )
        weights[:] = bias
    if store:
        clr.store_weights(weights, stats=stats)
    return weights
