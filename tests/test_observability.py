"""Compute accounting (MFU / roofline bookkeeping) unit tests.

The reference ships no profiling (SURVEY §5); this subsystem is new in
the TPU build: per-dispatch logical FLOPs + HBM byte bounds from XLA's
HloCostAnalysis on the unoptimized lowering (no backend compile).
"""

import jax
import jax.numpy as jnp
import numpy as np

import chromosight_tpu.observability as obs


def setup_function(_fn):
    obs.reset()


def test_account_dispatch_matmul_flops_and_io_bounds():
    m, k, n = 64, 128, 32
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.zeros((m, k), jnp.float32)
    b = jnp.zeros((k, n), jnp.float32)
    obs.account_dispatch("mm", f, a, b)
    obs.account_dispatch("mm", f, a, b)
    snap = obs.compute_snapshot()
    assert set(snap) == {"mm"}
    rec = snap["mm"]
    assert rec["dispatches"] == 2
    # logical matmul flops = 2*m*k*n per dispatch
    assert rec["flops"] == 2 * (2 * m * k * n)
    io_min = 4 * (m * k + k * n + m * n)
    assert rec["hbm_min_bytes"] == 2 * io_min
    assert rec["hbm_unfused_bytes"] >= rec["hbm_min_bytes"]


def test_cost_cache_ignores_traced_scalar_values():
    """Traced scalars (row counts, max_dist) must not fragment the cost
    cache — one trace per shape bucket, not one per chromosome."""
    f = jax.jit(lambda a, n: a * n)
    a = jnp.zeros((8, 8), jnp.float32)
    obs.account_dispatch("scaled", f, a, 3)
    before = len(obs._COST_CACHE)
    obs.account_dispatch("scaled", f, a, 7)  # same shapes, new scalar
    assert len(obs._COST_CACHE) == before
    assert obs.compute_snapshot()["scaled"]["dispatches"] == 2


def test_account_dispatch_never_raises_on_bad_args():
    obs.account_dispatch("broken", jax.jit(lambda a: a), object())
    assert obs.compute_snapshot()["broken"]["flops"] == 0.0


def test_reset_clears_compute_totals():
    f = jax.jit(lambda a: a + 1)
    obs.account_dispatch("x", f, jnp.zeros(4))
    obs.reset()
    assert obs.compute_snapshot() == {}


def test_device_peaks_cpu_is_none():
    peak_flops, peak_bw, label = obs.device_peaks()
    if jax.default_backend() == "cpu":
        assert peak_flops is None and peak_bw is None and label == "cpu"
    else:
        assert peak_flops > 0 and peak_bw > 0


def test_band_cost_scales_with_kernel_taps():
    """The band sweep's accounted FLOPs must track the sheared-stencil
    tap count (the analytic roofline NOTES.md reasons from)."""
    from chromosight_tpu.ops.band import band_normxcorr, shear_kernel

    n_pad, width = 256, 64
    band = jnp.zeros((n_pad, width), jnp.float32)
    miss = jnp.zeros((n_pad,), bool)

    def run(km, kn, name):
        k = np.ones((km, kn), np.float32)
        sh = jnp.asarray(shear_kernel(k))
        obs.account_dispatch(
            name,
            band_normxcorr,
            band,
            miss,
            jnp.asarray(k),
            sh,
            sh,
            (km, kn),
            n_pad,
            width - 1,
            0.5,
            0.3,
        )
        return obs.compute_snapshot()[name]["flops"]

    small = run(3, 3, "band3")
    big = run(7, 7, "band7")
    assert big > 2 * small
