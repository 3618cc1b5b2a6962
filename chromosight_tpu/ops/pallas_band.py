"""Pallas TPU kernel: fully-fused band normxcorr2.

One VMEM-resident pass per row tile computes all six sliding-window
reductions of the missing-corrected Pearson map (signal*K, mask*K,
mask*K^2 taps plus the three parallelogram window sums) and the final
algebra, so the band tensor is read from HBM exactly once and only the
output maps are written back - versus the XLA graph which materialises
each convolution intermediate in HBM.

Mosaic constraints shape the implementation: dynamic slicing happens on
*refs* (``pl.ds``), never on materialised arrays; inputs stay in
ANY/HBM space and are DMA'd per tile into VMEM scratch; outputs are
staged in VMEM and DMA'd back.

The kernel processes the *framed* band tensors produced by the same
prologue as ``ops.band.band_normxcorr`` (padding + analytic margin rules),
so numerics are identical; enable with CHROMOSIGHT_TPU_PALLAS=1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(
    sig_hbm,
    mask_hbm,
    coef_ref,  # (3, mk, nk+mk-1) SMEM sheared tap coefficients
    const_ref,  # (8,) SMEM scalars
    corr_hbm,
    logp_hbm,
    sig_tile,
    mask_tile,
    shift_sig,
    shift_mask,
    out_tile,
    logp_tile,
    sem,
    ssem,
    osem,
    *,
    tm,
    mk,
    nk,
    w_out,
    n_tiles,
    threshold,
):
    ksz = jnp.float32(mk * nk)
    ksum = const_ref[0]
    k2sum = const_ref[1]
    min_pres = const_ref[2]

    th = tm + mk - 1
    tw = w_out + mk - 1

    def tile_body(t, _):
        row0 = t * tm
        cp1 = pltpu.make_async_copy(
            sig_hbm.at[pl.ds(row0, th), :], sig_tile, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            mask_hbm.at[pl.ds(row0, th), :], mask_tile, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        zero = jnp.zeros((tm, w_out), jnp.float32)

        # --- the three tap convolutions --- #
        # Loop structure dictated by this toolchain's Mosaic: dynamic
        # sublane addressing of VMEM is unsupported (compiler crash), but
        # HBM->VMEM DMA with a dynamic row offset works. The kernel-row
        # loop therefore DMAs the u-shifted row block from HBM into a
        # scratch tile and unrolls the sheared column offsets statically.
        # Coefficients live in SMEM as (3, mk, nk+mk-1) sheared tables.
        n_shear = nk + mk - 1

        def row_body(u, accs):
            conv_sk, conv_mk, conv_mk2 = accs
            s1 = pltpu.make_async_copy(
                sig_hbm.at[pl.ds(row0 + u, tm), :], shift_sig, ssem.at[0]
            )
            s2 = pltpu.make_async_copy(
                mask_hbm.at[pl.ds(row0 + u, tm), :], shift_mask, ssem.at[1]
            )
            s1.start()
            s2.start()
            s1.wait()
            s2.wait()
            for w in range(n_shear):
                xs = shift_sig[:, w : w + w_out]
                ms = shift_mask[:, w : w + w_out]
                a = coef_ref[0, u, w]
                b = coef_ref[1, u, w]
                c = coef_ref[2, u, w]
                conv_sk = conv_sk + a * xs
                conv_mk = conv_mk + b * ms
                conv_mk2 = conv_mk2 + c * ms
            return (conv_sk, conv_mk, conv_mk2)

        conv_sk, conv_mk, conv_mk2 = lax.fori_loop(
            0, mk, row_body, (zero, zero, zero)
        )

        # --- parallelogram window sums (static unroll) --- #
        z2 = jnp.zeros((th, tw), jnp.float32)
        rx, rx2, rm = z2, z2, z2
        for v in range(nk):
            xs = sig_tile[:, v : v + tw]
            ms = mask_tile[:, v : v + tw]
            rx = rx + xs
            rx2 = rx2 + xs * xs
            rm = rm + ms
        # anti-diagonal accumulation: static unroll (mk is a Python int),
        # so lax.slice stays fully static for Mosaic
        ws_x = jnp.zeros((tm, w_out), jnp.float32)
        ws_x2 = jnp.zeros((tm, w_out), jnp.float32)
        ws_m = jnp.zeros((tm, w_out), jnp.float32)
        for u in range(mk):
            off = (mk - 1) - u
            ws_x = ws_x + lax.slice(rx, (u, off), (u + tm, off + w_out))
            ws_x2 = ws_x2 + lax.slice(rx2, (u, off), (u + tm, off + w_out))
            ws_m = ws_m + lax.slice(rm, (u, off), (u + tm, off + w_out))

        def snap(val):
            return jnp.where(jnp.abs(val) < threshold, 0.0, val)

        conv_sk = snap(conv_sk)
        conv_mk = snap(conv_mk)
        conv_mk2 = snap(conv_mk2)
        n_miss = snap(ws_m)
        sig_mean0 = snap(ws_x / ksz)
        sig2_mean0 = snap(ws_x2 / ksz)

        n_pres = ksz - n_miss
        kmean_eff = (ksum - conv_mk) / n_pres
        k2mean_eff = (k2sum - conv_mk2) / n_pres
        corr_f = ksz / n_pres
        sig_mean = sig_mean0 * corr_f
        sig2_mean = sig2_mean0 * corr_f
        denom = jnp.sqrt(
            (sig2_mean - sig_mean * sig_mean)
            * (k2mean_eff - kmean_eff * kmean_eff)
        )
        denom = jnp.where(n_pres < min_pres, 0.0, denom)
        num = (conv_sk - sig_mean * kmean_eff / corr_f) * corr_f
        inv_denom = jnp.where(jnp.abs(denom) < 1e-10, 0.0, 1.0 / denom)
        out = num * inv_denom
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        out = jnp.clip(out, -1.0, 1.0)

        # p-values need atanh/erfc which Mosaic lacks, and logp must be
        # computed from the *untrimmed* coefficients (reference reads
        # p-values before diag-trim): export raw out + counts, the XLA
        # epilogue applies trim / p-values / candidates.
        out_tile[:] = out
        logp_tile[:] = n_pres
        w1 = pltpu.make_async_copy(
            out_tile, corr_hbm.at[pl.ds(row0, tm), :], osem.at[0]
        )
        w2 = pltpu.make_async_copy(
            logp_tile, logp_hbm.at[pl.ds(row0, tm), :], osem.at[1]
        )
        w1.start()
        w2.start()
        w1.wait()
        w2.wait()
        return 0

    lax.fori_loop(0, n_tiles, tile_body, 0)


@partial(
    jax.jit,
    static_argnames=(
        "kernel_shape",
        "n",
        "max_dist",
        "missing_tol",
        "pearson_min",
        "threshold",
        "interpret",
    ),
)
def band_normxcorr_pallas(
    band,
    missing,
    kernel,
    kernel_shape,
    n,
    max_dist,
    missing_tol,
    pearson_min,
    threshold=1e-4,
    interpret=False,
):
    """Drop-in fused-Pallas equivalent of ``ops.band.band_normxcorr``.

    Same argument semantics and return values (corr, log10_pvals,
    candidates); the sheared kernels are implied by tap coefficients.
    """
    from chromosight_tpu.ops.band import _iota2, sliding_vector

    n_pad, width = band.shape
    mk, nk = kernel_shape
    big_k = max(mk, nk)
    ksize = mk * nk
    dt = jnp.float32
    band = band.astype(dt)
    kernel = kernel.astype(dt)

    # ---- framing prologue (identical to ops.band.band_normxcorr, incl.
    # the symmetric-reach column pad and the framed-coordinate
    # below-diagonal margin that generalise to rectangular kernels;
    # see ops/band.py:_pad_band and band_normxcorr's margin rules) ---- #
    i = _iota2((n_pad, width), 0)
    d = _iota2((n_pad, width), 1)
    j = i + d
    in_matrix = (j < n) & (i < n)
    sig = jnp.where(in_matrix, band, jnp.zeros((), dt))
    miss_pad = jnp.concatenate([missing, jnp.zeros((width,), missing.dtype)])
    miss_j = sliding_vector(miss_pad, n_pad, width)
    mask = (missing[:, None] | miss_j) & (d <= max_dist) & in_matrix

    kh = (mk - 1) // 2
    kw = (nk - 1) // 2
    reach = kh + kw
    sig_p = jnp.pad(sig, ((mk - 1, mk - 1), (reach, reach)))
    mask_p = jnp.pad(mask, ((mk - 1, mk - 1), (reach, reach))).astype(dt)
    pi = _iota2(sig_p.shape, 0) - (mk - 1)
    pd = _iota2(sig_p.shape, 1) - reach
    top_frame = pi < 0
    # Framed-coordinate below-diagonal margin: d in
    # [mk - nk - big_k, mk - nk - 1] (== [-big_k, -1] for square kernels).
    below_diag = (pd >= mk - nk - big_k) & (pd <= mk - nk - 1)
    # Right margin in padded coordinates so it also covers pad cells.
    pj = pi + pd
    right_margin = (pj >= n) & (pi >= n - max_dist - 2)
    mask_p = jnp.where(
        top_frame | below_diag | right_margin, jnp.asarray(1, dt), mask_p
    )
    sig_k = lax.dynamic_slice_in_dim(sig_p, kh, n_pad + mk - 1, axis=0)
    mask_k = lax.dynamic_slice_in_dim(mask_p, kh, n_pad + mk - 1, axis=0)

    tm = 256
    n_tiles = n_pad // tm
    if n_pad % tm:
        raise ValueError("n_pad must be a multiple of 256 for the pallas path")

    # Sheared SMEM coefficient tables (3, mk, nk+mk-1): zeros on unused taps
    mk_ = mk
    nsh = nk + mk_ - 1
    u_idx = _iota2((mk_, nsh), 0)
    w_idx = _iota2((mk_, nsh), 1)
    v_idx = w_idx - (mk_ - 1) + u_idx
    in_support = (v_idx >= 0) & (v_idx < nk)
    vc = jnp.clip(v_idx, 0, nk - 1)

    def _shear(mat):
        vals = mat[u_idx.reshape(-1), vc.reshape(-1)].reshape(mk_, nsh)
        return jnp.where(in_support, vals, jnp.zeros((), dt))

    coefs = jnp.stack(
        [_shear(kernel / ksize), _shear(kernel), _shear(kernel**2)]
    )
    consts = jnp.stack(
        [
            jnp.sum(kernel),
            jnp.sum(kernel**2),
            jnp.asarray(int((1 - missing_tol) * ksize), dt),
            jnp.asarray(n, dt),
            jnp.asarray(max_dist, dt),
            jnp.asarray(0, dt),
            jnp.asarray(0, dt),
            jnp.asarray(0, dt),
        ]
    )

    w_in = sig_k.shape[1]
    th = tm + mk - 1
    kern = partial(
        _fused_kernel,
        tm=tm,
        mk=mk,
        nk=nk,
        w_out=width,
        n_tiles=n_tiles,
        threshold=threshold,
    )
    corr, n_pres = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, width), dt),
            jax.ShapeDtypeStruct((n_pad, width), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((th, w_in), dt),
            pltpu.VMEM((th, w_in), dt),
            pltpu.VMEM((tm, w_in), dt),
            pltpu.VMEM((tm, w_in), dt),
            pltpu.VMEM((tm, width), dt),
            pltpu.VMEM((tm, width), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(sig_k, mask_k, coefs, consts)
    # XLA epilogue: p-values from the untrimmed coefficients, then the
    # diagonal trim / matrix bounds / candidate threshold.
    # log-space tail (matches ops.band.band_normxcorr): ndtr underflows
    # to 0 below ~1e-38 in f32; log_ndtr keeps the full dynamic range.
    z = jnp.arctanh(corr)
    logtail = jax.scipy.special.log_ndtr(-jnp.abs(z * jnp.sqrt(n_pres - 3)))
    logp = (logtail + jnp.log(jnp.asarray(2.0, dt))) / jnp.log(
        jnp.asarray(10.0, dt)
    )
    oi = _iota2((n_pad, width), 0)
    od = _iota2((n_pad, width), 1)
    keep = (od <= max_dist) & (oi < n) & ((oi + od) < n)
    corr = jnp.where(keep, corr, jnp.zeros((), dt))
    cand = (corr >= pearson_min) & (corr != 0.0)
    return corr, logp, cand
