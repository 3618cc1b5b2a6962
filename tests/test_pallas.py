"""Fused-Pallas band kernel: parity with the XLA band engine (interpret
mode on CPU only — Mosaic cannot compile it on the current TPU
toolchain, so TPU dispatch is fenced with a loud error; repro in
tools/pallas_compile_attempt.py)."""

import numpy as np
import pytest
# Full CLI / end-to-end runs: minutes on one core. `pytest -m "not slow"` is the fast tier.
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

import chromosight_tpu.kernels as ck
from chromosight_tpu.ops.band import band_normxcorr, shear_kernel
from chromosight_tpu.ops.pallas_band import band_normxcorr_pallas


@pytest.mark.parametrize("preset", ["loops_small", "loops"])
def test_pallas_matches_xla_band(preset):
    K = np.asarray(getattr(ck, preset)["kernels"][0], np.float32)
    mk = K.shape[0]
    n, max_dist = 300, 40
    width = max_dist + mk + 1
    n_pad = 512
    rng = np.random.RandomState(0)
    band = (
        rng.rand(n_pad, width) * (rng.rand(n_pad, width) < 0.4)
    ).astype(np.float32)
    band[n:] = 0
    miss = np.zeros(n_pad, bool)
    miss[[3, 77, 200]] = True
    band[miss] = 0

    ref = band_normxcorr(
        jnp.asarray(band),
        jnp.asarray(miss),
        jnp.asarray(K),
        jnp.asarray(shear_kernel(K), jnp.float32),
        jnp.asarray(shear_kernel(K**2), jnp.float32),
        K.shape,
        n,
        max_dist,
        0.5,
        0.3,
    )
    got = band_normxcorr_pallas(
        jnp.asarray(band),
        jnp.asarray(miss),
        jnp.asarray(K),
        K.shape,
        n,
        max_dist,
        0.5,
        0.3,
        interpret=jax.default_backend() == "cpu",
    )
    corr_ref = np.asarray(ref[0])
    corr_got = np.asarray(got[0])
    assert np.abs(corr_ref - corr_got).max() < 2e-5
    # Candidate masks may differ only at pixels sitting exactly on the
    # pearson threshold (fp32 accumulation-order epsilon).
    cand_diff = np.asarray(ref[2]) != np.asarray(got[2])
    assert np.all(np.abs(corr_ref[cand_diff] - 0.3) < 1e-4)
    # p-values are only consumed at (trimmed) candidate pixels; compare
    # them within the valid region (the engines' frame n_pres bookkeeping
    # differs in the meaningless pad corners).
    a, b = np.asarray(ref[1]), np.asarray(got[1])
    oi, od = np.indices(a.shape)
    valid = (od <= max_dist) & (oi + od < n) & (oi < n)
    a, b = a[valid], b[valid]
    assert (np.isfinite(a) == np.isfinite(b)).all()
    m = np.isfinite(a) & np.isfinite(b)
    assert np.abs(a[m] - b[m]).max() < 2e-3


@pytest.mark.parametrize("kshape", [(5, 9), (3, 17)])
def test_pallas_matches_xla_band_rectangular(kshape):
    """Wide rectangular kernels must agree between the Pallas and XLA
    band engines (the framing prologues share the symmetric-reach pad
    and framed-coordinate margin rules)."""
    rng = np.random.RandomState(11)
    K = (rng.rand(*kshape) + 0.1).astype(np.float32)
    mk, nk = K.shape
    n, max_dist = 300, 40
    width = max_dist + max(mk, nk) + 1
    n_pad = 512
    band = (
        rng.rand(n_pad, width) * (rng.rand(n_pad, width) < 0.4)
    ).astype(np.float32)
    band[n:] = 0
    miss = np.zeros(n_pad, bool)
    miss[[3, 77, 200]] = True
    band[miss] = 0

    ref = band_normxcorr(
        jnp.asarray(band),
        jnp.asarray(miss),
        jnp.asarray(K),
        jnp.asarray(shear_kernel(K), jnp.float32),
        jnp.asarray(shear_kernel(K**2), jnp.float32),
        K.shape,
        n,
        max_dist,
        0.5,
        0.3,
    )
    got = band_normxcorr_pallas(
        jnp.asarray(band),
        jnp.asarray(miss),
        jnp.asarray(K),
        K.shape,
        n,
        max_dist,
        0.5,
        0.3,
        interpret=jax.default_backend() == "cpu",
    )
    corr_ref = np.asarray(ref[0])
    corr_got = np.asarray(got[0])
    assert np.abs(corr_ref - corr_got).max() < 2e-5


def test_pallas_flag_fenced_on_tpu(monkeypatch):
    """CHROMOSIGHT_TPU_PALLAS=1 on a non-CPU backend must refuse loudly
    (Mosaic cannot compile the kernel on the current TPU toolchain)
    instead of dispatching an uncompilable path."""
    from chromosight_tpu import detection

    monkeypatch.setenv("CHROMOSIGHT_TPU_PALLAS", "1")
    monkeypatch.setattr(
        detection, "jax_default_backend_is_cpu", lambda: False
    )

    class _Map:
        max_dist = 40

    K = np.asarray(ck.loops_small["kernels"][0], np.float32)
    monkeypatch.setattr(
        detection,
        "_pad_to_bucket",
        lambda cm: (
            jnp.zeros((128, 64), jnp.float32),
            np.zeros(128, bool),
            100,
            64,
        ),
    )
    with pytest.raises(RuntimeError, match="does not compile"):
        detection._band_correlate(
            _Map(),
            {"max_perc_undetected": 50.0, "pearson": 0.3},
            K,
            None,
        )
