"""2D cross-correlation primitives on dense device tensors.

The reference implements `xcorr2` as a sum of banded sparse matmuls, one per
kernel row/column (reference ``utils/detection.py:595-804``).  On TPU the
idiomatic formulation is a dense XLA convolution (`lax.conv_general_dilated`
performs cross-correlation - no kernel flip - and is lowered onto the MXU),
with the reference's special cases mapped to cheaper structures:

* constant (uniform) kernels -> separable window sums via two 1D
  `reduce_window` passes (O(k) instead of O(k^2) work per pixel);
* tSVD-factorised kernels -> rank-k separable convolution expressed as two
  chained convs with channel contraction.

All functions reproduce the reference's numerical quirks needed for output
parity: conv outputs below ``threshold`` (1e-4 through the public `xcorr2`,
reference ``detection.py:595``) are snapped to zero, and "valid"-mode
outputs are zero-padded back to the input shape with (k-1)//2 margins
(reference ``detection.py:715-723``).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_THRESHOLD = 1e-4

_DIMNUMS = ("NCHW", "OIHW", "NCHW")


def _as_nchw(x):
    return x[jnp.newaxis, jnp.newaxis, :, :]


def _row_toeplitz(kernel_row, w_in, dtype):
    """Banded Toeplitz matrix T with T[w, c] = kernel_row[w - c] for
    0 <= w - c < len(kernel_row); shape (w_in, w_in - ktaps + 1).

    Multiplying a signal row (length w_in) by T performs its valid 1D
    correlation with ``kernel_row``.
    """
    ktaps = kernel_row.shape[0]
    w_out = w_in - ktaps + 1
    r = lax.broadcasted_iota(jnp.int32, (w_in, w_out), 0)
    c = lax.broadcasted_iota(jnp.int32, (w_in, w_out), 1)
    t = r - c
    inband = (t >= 0) & (t < ktaps)
    vals = jnp.take(
        kernel_row.astype(dtype), jnp.clip(t, 0, ktaps - 1)
    )
    return jnp.where(inband, vals, jnp.zeros((), dtype))


# Above this ratio of signal width to kernel taps, the banded-Toeplitz
# matmul wastes too many MXU FLOPs on the (mostly zero) dense inner
# dimension and the unrolled shift-FMA formulation wins: for a 2048-wide
# tile with a 17-tap kernel the matmul performs ~120x the essential
# FLOPs, while 289 fused shifted multiply-adds stream at VPU/HBM speed.
_SHIFT_WASTE_RATIO = 24


def _conv2d_valid_shifts(signal, kernel):
    """Valid 2D cross-correlation as shifted multiply-adds.

    A ``fori_loop`` over kernel rows bounds live memory to the
    accumulator plus one fused row pass (a fully unrolled mk*nk chain
    leaves XLA free to materialise dozens of tile-sized temporaries —
    observed OOM at (8, 2048, 2048) under vmap); the nk taps within a
    row stay unrolled and fuse into a single elementwise pass."""
    mk, nk = kernel.shape
    h_out = signal.shape[0] - mk + 1
    w_out = signal.shape[1] - nk + 1
    kern = kernel.astype(signal.dtype)

    def body(u, acc):
        row = lax.dynamic_slice(
            signal, (u, 0), (h_out, signal.shape[1])
        )
        krow = lax.dynamic_slice(kern, (u, 0), (1, nk))
        term = None
        for v in range(nk):
            t = (
                lax.dynamic_slice_in_dim(row, v, w_out, axis=1)
                * krow[0, v]
            )
            term = t if term is None else term + t
        return acc + term

    init = jnp.zeros((h_out, w_out), signal.dtype)
    return lax.fori_loop(0, mk, body, init)


def conv2d_valid(signal, kernel):
    """Valid-mode 2D cross-correlation of a 2D signal with a 2D kernel.

    Two formulations, chosen by shape:
    * narrow signals (band tensors): a sum over kernel rows of
      (row-shifted signal) x (banded Toeplitz) matmuls — single-channel
      spatial convolutions lower poorly on the TPU (no channel dimension
      to feed the MXU), while this is mk large matmuls at full MXU
      throughput;
    * wide signals (square tiles): the dense Toeplitz inner dimension
      would waste ~(width/taps)x FLOPs, so the unrolled shift-FMA
      formulation is used instead.
    """
    mk, nk = kernel.shape
    if signal.shape[1] >= _SHIFT_WASTE_RATIO * nk:
        if _use_chunk_conv():
            return conv2d_valid_chunked(signal, kernel)
        if _use_phase_conv():
            return conv2d_valid_phase(signal, kernel)
        return _conv2d_valid_shifts(signal, kernel)
    h_out = signal.shape[0] - mk + 1
    w_in = signal.shape[1]
    acc = None
    for u in range(mk):
        T = _row_toeplitz(kernel[u], w_in, signal.dtype)
        term = jnp.dot(
            lax.dynamic_slice_in_dim(signal, u, h_out, axis=0),
            T,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=signal.dtype,
        )
        acc = term if acc is None else acc + term
    return acc


_PHASES = 128


def _use_phase_conv():
    """Opt-in (CHROMOSIGHT_TPU_PHASE_CONV=1, read at trace time).

    The polyphase formulation wins decisively in isolation (conv_sk
    319 ms -> 77 ms on B=32 x 2080^2 tiles) but LOSES inside the full
    fused crossing program: genome --inter steady wall 65.1 s
    (shift-FMA) vs 119.7 s (polyphase), same tunnel, calls identical —
    XLA fuses the shift-FMA taps with the scatter producer and the
    elementwise epilogue, while the channelized conv forms a fusion
    barrier (materialized phase-padded input + conv output) that costs
    more HBM traffic than the taps save.  Kept as an opt-in probe
    surface for future toolchains."""
    import os

    return os.environ.get("CHROMOSIGHT_TPU_PHASE_CONV", "0") == "1"


def _phase_kernel(kernel, phases, groups=()):
    """Polyphase conv filter for :func:`conv2d_valid_phase`.

    Maps a dense (mk, nk) correlation kernel onto an HWIO filter
    (mk, Tt, P, P * (1 + len(groups))): splitting the signal's columns
    into P interleaved phases turns the column taps into a P-channel
    contraction, so the whole 2D correlation lowers to ONE MXU-native
    ``conv_general_dilated`` instead of mk*nk shifted multiply-adds
    (each of which costs a full HBM pass on this toolchain — the
    scheduler does not fuse sliced terms).

    Entry rule: output phase r at filter column t reads input phase c
    when the original column tap v = P*t + c - r lies in [0, nk).

    ``groups`` optionally appends extra output-channel groups, each a
    (mk, nk) kernel correlated in the same pass (e.g. a ones kernel for
    the sliding window sum) — extra outputs ride the same signal read.
    """
    mk, nk = kernel.shape
    P = phases
    Tt = (nk - 2) // P + 2 if nk > 1 else 1
    shape = (mk, Tt, P, P)
    u = lax.broadcasted_iota(jnp.int32, shape, 0)
    t = lax.broadcasted_iota(jnp.int32, shape, 1)
    c = lax.broadcasted_iota(jnp.int32, shape, 2)
    r = lax.broadcasted_iota(jnp.int32, shape, 3)
    v = P * t + c - r
    valid = (v >= 0) & (v < nk)
    idx = u * nk + jnp.clip(v, 0, nk - 1)

    def fill(k2d):
        flat = k2d.reshape(-1)
        return jnp.where(valid, flat[idx], jnp.zeros((), k2d.dtype))

    parts = [fill(kernel)] + [fill(g.astype(kernel.dtype)) for g in groups]
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def conv2d_valid_phase(signal, kernel, extra_kernels=(), phases=_PHASES):
    """Valid 2D cross-correlation via polyphase channelization.

    The signal's W columns are reshaped into (W/P, P) so column taps
    become input channels and the correlation lowers to a single
    ``lax.conv_general_dilated`` with P in/out channels — the MXU-native
    formulation of a wide-tile conv (the shift-FMA fallback reads the
    signal from HBM once per tap: 289 passes for a 17x17 kernel).

    ``extra_kernels`` are additional (mk, nk) kernels correlated in the
    same pass (sharing the single signal read); returns a single
    (h_out, w_out) array, or a tuple of them when extra kernels are
    given.  Replaces the banded-Toeplitz sum of the reference's sparse
    engine (reference ``detection.py:699-713``) for dense tiles.
    """
    mk, nk = kernel.shape
    P = phases
    H, W = signal.shape
    h_out, w_out = H - mk + 1, W - nk + 1
    kp = _phase_kernel(kernel.astype(signal.dtype), P, extra_kernels)
    Tt = kp.shape[1]
    n_grp = kp.shape[3] // P
    Nq = -(-W // P) + (Tt - 1)
    x = jnp.pad(signal, ((0, 0), (0, Nq * P - W)))
    x = x.reshape(1, H, Nq, P)
    out = lax.conv_general_dilated(
        x,
        kp,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=signal.dtype,
    )
    wq = Nq - Tt + 1
    if n_grp == 1:
        return out.reshape(h_out, wq * P)[:, :w_out]
    out = out.reshape(h_out, wq, n_grp, P)
    return tuple(
        out[:, :, g, :].reshape(h_out, wq * P)[:, :w_out]
        for g in range(n_grp)
    )


def _chunk_width():
    """Output-chunk width C of the block-banded Toeplitz conv.

    FLOPs per output pixel are 2*mk*(C + nk - 1): the stencil matmul
    wastes (C + nk - 1)/nk over the direct conv, so smaller C cuts MXU
    work — down to the MXU's 128-lane granularity, below which the
    matmuls stop saturating the array.  Compute-accounting on the
    genome --inter scan: C=256 executes 227 TFLOP (16x waste for 17-wide
    kernels); C=128 halves that.  CHROMOSIGHT_TPU_CHUNK overrides for
    A/Bs.
    """
    return int(os.environ.get("CHROMOSIGHT_TPU_CHUNK", 128))


def _use_chunk_conv():
    """Default-on where there is an MXU to feed (any non-CPU backend;
    CHROMOSIGHT_TPU_CHUNK_CONV=0/1 overrides, read at trace time):
    block-banded chunked-Toeplitz conv for wide tiles — mk HBM passes
    instead of mk*nk, MXU-saturating stencil matmuls, FLOP waste only
    (C+nk-1)/nk over the direct conv (vs width/nk for the full
    Toeplitz).

    Measured on the genome --inter config (60 tile batches, same-day
    stage counters, which are far less tunnel-noise-sensitive than
    walls): tile-batch device waits 26.4 s (shift-FMA) -> **14.4 s**,
    steady wall 53-71 s -> 36.6 s, 159 calls identical.  (Wall-level
    A/Bs through the tunnel are unreliable: the identical shift-FMA
    binary measured 53.0/65.1/70.6 s across three runs.)  On CPU the
    stencil matmuls have no MXU to ride and measure 4.4x SLOWER than
    shift-FMA (2064^2 x 17^2 tile: 1.29 s vs 0.29 s steady), so the
    CPU default stays shift-FMA."""
    import os

    v = os.environ.get("CHROMOSIGHT_TPU_CHUNK_CONV")
    if v is not None:
        return v != "0"
    import jax

    return jax.default_backend() != "cpu"


def _chunk_signal(signal, C, nk):
    """(H, W) -> (H, n_chunks, C + nk - 1) overlapping column chunks.

    Chunk i covers input columns [i*C, i*C + C + nk - 1): a C-wide body
    plus the (nk-1)-wide halo shared with chunk i+1 — built from two
    reshapes and a concat (no gathers: computed-index gathers serialize
    on this toolchain; see NOTES.md).
    """
    H, W = signal.shape
    # Wb + C - W (the pad width below) goes negative when C < nk - 1;
    # clamp so caller-supplied chunk sizes smaller than the kernel halo
    # stay valid (the defaults never hit this: C=256, kernels <= 17).
    C = max(C, nk - 1)
    w_out = W - nk + 1
    n_chunks = -(-w_out // C)
    Wb = n_chunks * C
    x = jnp.pad(signal, ((0, 0), (0, Wb + C - W)))
    body = x[:, :Wb].reshape(H, n_chunks, C)
    halo = x[:, C : C + Wb].reshape(H, n_chunks, C)[:, :, : nk - 1]
    return jnp.concatenate([body, halo], axis=2)


def conv2d_valid_chunked(
    signal, kernel, extra_kernels=(), squared_kernels=(), chunk=None
):
    """Valid 2D cross-correlation via block-banded Toeplitz chunks.

    Output columns are split into C-wide chunks; each chunk is a
    (h_out, C+nk-1) @ (C+nk-1, C) stencil matmul per kernel row, so the
    whole correlation is mk MXU matmuls reading the signal mk times
    (the shift-FMA formulation reads it mk*nk times — one full HBM pass
    per tap).  FLOP waste over the direct conv is (C+nk-1)/nk, vs
    width/nk for the un-chunked Toeplitz of :func:`conv2d_valid`'s
    narrow branch (reference sparse engine: ``detection.py:699-713``).

    ``extra_kernels`` ride the same slab read as stacked stencil
    columns; ``squared_kernels`` are correlated against signal**2
    (squared on the fly per slab — no materialized square).  Returns a
    single array, or a tuple ordered (kernel, *extras, *squared).
    """
    mk, nk = kernel.shape
    H, W = signal.shape
    h_out, w_out = H - mk + 1, W - nk + 1
    dt = signal.dtype
    C = _chunk_width() if chunk is None else chunk
    xc = _chunk_signal(signal, C, nk)
    n_chunks = xc.shape[1]
    Cw = C + nk - 1
    kerns = [kernel] + list(extra_kernels)

    def stencil(ks, u):
        return jnp.concatenate(
            [_row_toeplitz(k[u].astype(dt), Cw, dt) for k in ks], axis=1
        )

    acc = acc2 = None
    for u in range(mk):
        slab = lax.dynamic_slice(xc, (u, 0, 0), (h_out, n_chunks, Cw))
        t = jnp.dot(
            slab,
            stencil(kerns, u),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=dt,
        )
        acc = t if acc is None else acc + t
        if squared_kernels:
            t2 = jnp.dot(
                slab * slab,
                stencil(squared_kernels, u),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=dt,
            )
            acc2 = t2 if acc2 is None else acc2 + t2

    def split(a, n):
        return [
            a[:, :, g * C : (g + 1) * C].reshape(h_out, n_chunks * C)[
                :, :w_out
            ]
            for g in range(n)
        ]

    outs = split(acc, len(kerns))
    if squared_kernels:
        outs += split(acc2, len(squared_kernels))
    return outs[0] if len(outs) == 1 else tuple(outs)


def conv2d_valid_multik(signal, kernels):
    """Valid-mode cross-correlation with K same-shape kernels at once.

    ``kernels`` is (K, mk, nk); returns (K, H', W').  Multi-kernel configs
    (e.g. the borders preset's three kernels, reference
    ``kernels/borders.json``) correlate the same signal with every kernel;
    sharing one pass reads the signal from HBM once and, on the banded
    Toeplitz path, widens the matmul's output dimension K-fold — better
    MXU utilisation than K separate sweeps.
    """
    k, mk, nk = kernels.shape
    h_out = signal.shape[0] - mk + 1
    w_in = signal.shape[1]
    w_out = w_in - nk + 1
    kern = kernels.astype(signal.dtype)
    if w_in >= _SHIFT_WASTE_RATIO * nk:
        # wide signals: K*nk fused shifted multiply-adds per kernel row,
        # accumulator bounded to (K, h_out, w_out)
        def body(u, acc):
            row = lax.dynamic_slice(
                signal, (u, 0), (h_out, signal.shape[1])
            )
            krow = lax.dynamic_slice(kern, (0, u, 0), (k, 1, nk))
            term = None
            for v in range(nk):
                t = (
                    lax.dynamic_slice_in_dim(row, v, w_out, axis=1)[None]
                    * krow[:, :, v, None]
                )
                term = t if term is None else term + t
            return acc + term

        init = jnp.zeros((k, h_out, w_out), signal.dtype)
        return lax.fori_loop(0, mk, body, init)
    # narrow signals (band tensors): one (h_out, w_in) @ (w_in, K*w_out)
    # matmul per kernel row — the K Toeplitz blocks concatenated along the
    # output columns
    acc = None
    for u in range(mk):
        T = jax.vmap(lambda kr: _row_toeplitz(kr, w_in, signal.dtype))(
            kern[:, u, :]
        )  # (K, w_in, w_out)
        T = jnp.transpose(T, (1, 0, 2)).reshape(w_in, k * w_out)
        term = jnp.dot(
            lax.dynamic_slice_in_dim(signal, u, h_out, axis=0),
            T,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=signal.dtype,
        )
        acc = term if acc is None else acc + term
    return jnp.transpose(acc.reshape(h_out, k, w_out), (1, 0, 2))


def conv2d_valid_multi(signal, kernels):
    """Valid-mode cross-correlation with a stack of kernels (k, mk, nk).

    Returns (k, H', W').  One fused XLA conv so all kernels share a single
    read of the signal from HBM.
    """
    out = lax.conv_general_dilated(
        _as_nchw(signal),
        kernels[:, jnp.newaxis, :, :].astype(signal.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DIMNUMS,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=signal.dtype,
    )
    return out[0]


def window_sum_valid(signal, window_shape):
    """Valid-mode sliding-window sum (correlation with a kernel of ones).

    Separable O(mk + nk) shifted-slice accumulation (lax.reduce_window
    lowers to a serial scan on TPU; plain adds stream at HBM bandwidth).
    """
    mk, nk = window_shape
    h_out = signal.shape[0] - mk + 1
    rows = None
    for u in range(mk):
        term = lax.dynamic_slice_in_dim(signal, u, h_out, axis=0)
        rows = term if rows is None else rows + term
    w_out = signal.shape[1] - nk + 1
    out = None
    for v in range(nk):
        term = lax.dynamic_slice_in_dim(rows, v, w_out, axis=1)
        out = term if out is None else out + term
    return out


def conv2d_valid_separable(signal, left, right):
    """Valid-mode correlation with a rank-r factorised kernel.

    ``left`` is (mk, r), ``right`` is (r, nk); the implied kernel is
    ``left @ right`` (reference tSVD path, ``detection.py:648-665``).
    Computed as r row-convolutions followed by a channel-contracting
    column-convolution: O(r*(mk+nk)) work per pixel instead of O(mk*nk).
    """
    mk, r = left.shape
    nk = right.shape[1]
    h_out = signal.shape[0] - mk + 1
    w_out = signal.shape[1] - nk + 1
    # Row pass: mid[f, i, j] = sum_u left[u, f] * signal[i+u, j], expressed
    # as a stack of row shifts contracted on the MXU.
    shifted = jnp.stack(
        [lax.dynamic_slice_in_dim(signal, u, h_out, axis=0) for u in range(mk)]
    )  # (mk, h_out, W)
    mid = jnp.einsum(
        "uf,uhw->fhw",
        left.astype(signal.dtype),
        shifted,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=signal.dtype,
    )
    # Column pass with channel contraction:
    # out[i, j] = sum_f sum_v right[f, v] * mid[f, i, j+v]
    shifted2 = jnp.stack(
        [lax.dynamic_slice_in_dim(mid, v, w_out, axis=2) for v in range(nk)],
        axis=1,
    )  # (r, nk, h_out, w_out)
    out = jnp.einsum(
        "fv,fvhw->hw",
        right.astype(signal.dtype),
        shifted2,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=signal.dtype,
    )
    return out


def _snap_small(x, threshold):
    if threshold is None:
        return x
    return jnp.where(jnp.abs(x) < threshold, jnp.zeros((), x.dtype), x)


def pad_margins(valid_out, kernel_shape):
    """Zero-pad a valid-mode output back to the original signal shape with
    (k-1)//2 margins on each side (reference ``detection.py:797-804``)."""
    mk, nk = kernel_shape
    kh, kw = (mk - 1) // 2, (nk - 1) // 2
    # valid output is (H-mk+1, W-nk+1); padding kh/kw on both sides restores
    # (H-1+1-mk+2kh, ...) = (H - (mk-1) + 2*(mk-1)//2) which equals H for odd
    # kernels and H-1 for even ones - identical to the reference behaviour.
    return jnp.pad(valid_out, ((kh, kh), (kw, kw)))


@partial(jax.jit, static_argnames=("kernel_shape", "threshold", "separable"))
def _xcorr2_impl(signal, kernel, kernel_shape, threshold, separable):
    if separable:
        left, right = kernel
        out = conv2d_valid_separable(signal, left, right)
    else:
        out = conv2d_valid(signal, kernel)
    out = _snap_small(out, threshold)
    return pad_margins(out, kernel_shape)


def xcorr2(signal, kernel, threshold=DEFAULT_THRESHOLD):
    """Dense cross-correlation with reference-parity thresholding/padding.

    Accepts either a 2D kernel array or a tuple (left, right) of factorised
    singular matrices (the tSVD path).  Output has the same shape as the
    signal, with zero margins where the kernel would overlap the edges.
    """
    signal = jnp.asarray(signal)
    if isinstance(kernel, tuple):
        left = jnp.asarray(kernel[0], signal.dtype)
        right = jnp.asarray(kernel[1], signal.dtype)
        if left.shape[1] != right.shape[0]:
            raise ValueError("Kernel factorisation is invalid")
        kshape = (left.shape[0], right.shape[1])
        return _xcorr2_impl(
            signal, (left, right), kshape, threshold, separable=True
        )
    kernel = jnp.asarray(kernel, signal.dtype)
    return _xcorr2_impl(
        signal, kernel, kernel.shape, threshold, separable=False
    )
