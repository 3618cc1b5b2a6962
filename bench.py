#!/usr/bin/env python3
"""Benchmark: genome-scale loop scan throughput (windows scored / second).

Workload: one human-like chromosome at 5 kb resolution (default 20k bins ~
100 Mb), loops kernel (17x17), scan band of 400 diagonals (2 Mb) - the
shape of the BASELINE.json "human 5kb genome-wide detect" configs.

Two engines are timed on identical data:

* TPU engine: the fused band normxcorr2 (detrend + missing-corrected
  Pearson + p-values + candidate thresholding) from
  ``chromosight_tpu.ops.band``, executed on the default JAX device.
* Reference-style baseline: the reference algorithm's CPU formulation -
  scipy sparse banded-Toeplitz matmul convolutions, six passes, identical
  Pearson algebra (what ``chromosight detect`` does per submatrix,
  reference ``utils/detection.py:917-1131``).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} where
value is TPU windows/s and vs_baseline is the speedup over the baseline
engine (>1 = faster than reference-equivalent CPU).
"""

import json
import os
import time

import numpy as np

from chromosight_tpu.config import init_compilation_cache

init_compilation_cache()

N_BINS = int(os.environ.get("CHROMOSIGHT_BENCH_BINS", 20000))
MAX_DIST = int(os.environ.get("CHROMOSIGHT_BENCH_MAXDIST", 400))
BASELINE_BINS = int(os.environ.get("CHROMOSIGHT_BENCH_BASELINE_BINS", 5000))
REPS = int(os.environ.get("CHROMOSIGHT_BENCH_REPS", 3))


def synthetic_chromosome(n, width, seed=0):
    """Detrended-looking sparse band with planted loops and missing bins."""
    rng = np.random.RandomState(seed)
    decay = np.exp(-np.arange(width) / 60.0)
    keep_prob = np.clip(decay * 2.0, 0.02, 0.9)
    mask = rng.rand(n, width) < keep_prob[None, :]
    band = np.where(mask, rng.gamma(2.0, 0.5, size=(n, width)), 0.0)
    missing = np.zeros(n, dtype=bool)
    missing[rng.choice(n, n // 20, replace=False)] = True
    band[missing, :] = 0
    # plant some loops
    import chromosight_tpu.kernels as ck

    K = np.asarray(ck.loops["kernels"][0])
    mk = K.shape[0]
    for _ in range(n // 100):
        i = rng.randint(mk, n - mk)
        d = rng.randint(40, width - mk - 1)
        r0, d0 = i - mk // 2, d - mk // 2
        band[r0 : r0 + mk, d0 : d0 + mk] += K * 2
    band[missing, :] = 0
    return band.astype(np.float64), missing, K


def run_tpu(band, missing, K, max_dist, reps):
    import jax.numpy as jnp

    from chromosight_tpu.ops.band import (
        band_normxcorr,
        extract_candidates_packed,
        shear_kernel,
    )

    n, width = band.shape
    n_pad = ((n + 511) // 512) * 512
    bp = np.zeros((n_pad, width), np.float32)
    bp[:n] = band
    mp = np.zeros(n_pad, bool)
    mp[:n] = missing
    args = (
        jnp.asarray(bp),
        jnp.asarray(mp),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(shear_kernel(K), jnp.float32),
        jnp.asarray(shear_kernel(K**2), jnp.float32),
    )
    cap = 1 << 16

    def step():
        """Full production step: fused Pearson map + device-side sparse
        candidate extraction + one host transfer of the packed lists."""
        corr, logp, cand = band_normxcorr(
            *args, K.shape, n, max_dist, 0.5, 0.3
        )
        packed = extract_candidates_packed(corr, cand, cap)
        # the host transfer is the execution fence (block_until_ready is
        # unreliable through a tunneled device)
        packed = np.asarray(packed)
        return packed, int(packed[3, 0])

    out = step()  # compile + warmup
    n_cand = out[1]
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step()
        times.append(time.perf_counter() - t0)
    return min(times), n_cand


def run_baseline(band, missing, K, max_dist):
    """Reference-formulation CPU engine: sparse banded-matmul convolutions
    plus the missing-corrected Pearson algebra, on scipy CSR."""
    import scipy.sparse as sp

    n, width = band.shape
    # rebuild the upper-band sparse matrix
    i, d = np.nonzero(band)
    j = i + d
    ok = j < n
    signal = sp.coo_matrix(
        (band[i[ok], d[ok]], (i[ok], j[ok])), shape=(n, n)
    ).tocsr()
    mk, nk = K.shape

    # frame with margins (reference detection.py:979-993)
    def frame(mat, fill_rows=0):
        m = sp.csr_matrix((mk - 1, mat.shape[1]))
        out = sp.vstack([m, mat, m], format="csr")
        m2 = sp.csr_matrix((out.shape[0], nk - 1))
        return sp.hstack([m2, out, m2], format="csr")

    t0 = time.perf_counter()
    framed = frame(signal)
    # missing mask (cross within max_dist) as sparse bool
    mi = np.flatnonzero(missing)
    rows_list, cols_list = [], []
    shifts = np.arange(max_dist + 1)
    rows_list.append((mi[:, None] - shifts[None, :]).ravel())
    cols_list.append(np.repeat(mi, max_dist + 1))
    rows_list.append(np.repeat(mi, max_dist + 1))
    cols_list.append((mi[:, None] + shifts[None, :]).ravel())
    rr = np.concatenate(rows_list)
    cc = np.concatenate(cols_list)
    okm = (rr >= 0) & (rr < n) & (cc >= 0) & (cc < n)
    mask = sp.coo_matrix(
        (np.ones(okm.sum()), (rr[okm], cc[okm])), shape=(n, n)
    ).tocsr()
    mask.data[:] = 1
    framed_mask = frame(mask)
    # below-diagonal margins
    big_k = max(mk, nk)
    framed_mask = (
        framed_mask
        + sp.diags(
            np.ones(big_k),
            -np.arange(1, big_k + 1),
            shape=framed_mask.shape,
            format="csr",
        )
    ).tocsr()
    framed_mask.data[:] = 1

    def xcorr_sparse(mat, kern):
        """Reference-style conv: one banded matmul per kernel row
        (detection.py:699-713)."""
        sm, sn = mat.shape
        km, kn_ = kern.shape
        out = None
        for ki in range(km):
            sub = sp.diags(
                kern[ki, :],
                np.arange(kn_),
                shape=(sn - kn_ + 1, sn),
                format="csr",
            )
            term = mat[ki : sm - km + 1 + ki, :].dot(sub.T)
            out = term if out is None else out + term
        out.data[np.abs(out.data) < 1e-4] = 0
        out.eliminate_zeros()
        return out

    ksize = mk * nk
    kernel1 = np.ones(K.shape)
    ksum, k2sum = K.sum(), (K**2).sum()
    sig_mean = xcorr_sparse(framed, kernel1 / ksize)
    sig2 = framed.copy()
    sig2.data = sig2.data**2
    sig2_mean = xcorr_sparse(sig2, kernel1 / ksize)
    conv_k = xcorr_sparse(framed, K / ksize)
    n_miss = xcorr_sparse(framed_mask, kernel1)
    conv_mk = xcorr_sparse(framed_mask, K)
    conv_mk2 = xcorr_sparse(framed_mask, K**2)
    # Pearson algebra on the union of nonzero patterns (dense on the band
    # region only, like the reference's per-entry corrections)
    npres = ksize - n_miss.toarray()
    with np.errstate(divide="ignore", invalid="ignore"):
        kmean_eff = (ksum - conv_mk.toarray()) / npres
        k2mean_eff = (k2sum - conv_mk2.toarray()) / npres
        corr_f = ksize / npres
        sm_ = sig_mean.toarray() * corr_f
        s2m = sig2_mean.toarray() * corr_f
        denom = np.sqrt((s2m - sm_**2) * (k2mean_eff - kmean_eff**2))
        denom[npres < int(0.5 * ksize)] = 0
        num = (conv_k.toarray() - sm_ * kmean_eff / corr_f) * corr_f
        corr = np.where(np.abs(denom) < 1e-10, 0.0, num / denom)
    corr[~np.isfinite(corr)] = 0
    np.clip(corr, -1, 1, out=corr)
    cand = (corr >= 0.3).sum()
    t = time.perf_counter() - t0
    return t, int(cand)


def main():
    width = MAX_DIST + 17 + 1
    band, missing, K = synthetic_chromosome(N_BINS, width)
    windows = N_BINS * (MAX_DIST + 1)

    t_tpu, cand_tpu = run_tpu(band, missing, K, MAX_DIST, REPS)
    tpu_wps = windows / t_tpu

    # Baseline on a smaller slice (linear-in-n workload), scaled per-window
    nb = min(BASELINE_BINS, N_BINS)
    t_cpu, cand_cpu = run_baseline(
        band[:nb], missing[:nb], K, MAX_DIST
    )
    cpu_wps = (nb * (MAX_DIST + 1)) / t_cpu

    print(
        json.dumps(
            {
                "metric": (
                    "chromosome-scale loop-scan throughput "
                    f"(fused band normxcorr2, {N_BINS} bins x "
                    f"{MAX_DIST + 1} diagonals)"
                ),
                "value": round(tpu_wps, 1),
                "unit": "windows/s",
                "vs_baseline": round(tpu_wps / cpu_wps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
