"""ICE balancing parity against cooler.

``data_test/example.cool`` ships the weight column produced by
``cooler.balance_cooler`` (vendored from the reference repo, byte-identical
to its fixture).  The reference pipeline delegates balancing to cooler with
``mad_max=5, cis_only, ignore_diags=2, max_iters=200, min_nnz=10``
(reference ``contacts_map.py:209-219``); our ``ice_balance`` must reproduce
those weights, including the exclusion (NaN) set."""

import shutil

import numpy as np
import pytest

from chromosight_tpu.io.cool import CoolFile
from chromosight_tpu.ops.balance import ice_balance


@pytest.fixture
def cool_copy(example_cool, tmp_path):
    path = str(tmp_path / "example.cool")
    shutil.copy(example_cool, path)
    return path


def _stored_weights(path):
    import h5py

    with h5py.File(path, "r") as f:
        return f["bins/weight"][:]


def test_ice_matches_cooler_weights(cool_copy):
    """Same exclusion set as cooler and weights within convergence
    tolerance (tol=1e-6 tightens agreement to <1e-3 relative)."""
    ref_w = _stored_weights(cool_copy)
    w = ice_balance(CoolFile(cool_copy), cis_only=True, tol=1e-6, store=False)
    # identical NaN (excluded-bin) set: min_nnz + MAD-max rules
    assert np.array_equal(np.isnan(w), np.isnan(ref_w))
    both = np.isfinite(w)
    rel = np.abs(w[both] - ref_w[both]) / np.abs(ref_w[both])
    assert rel.max() < 2e-3


def test_ice_balanced_marginals_are_unit(cool_copy):
    """After balancing, included bins' marginals of the balanced cis
    matrix must be ~1 (the ICE fixed point)."""
    clr = CoolFile(cool_copy)
    w = ice_balance(clr, cis_only=True, tol=1e-7, store=False)
    offsets = np.asarray(clr._chrom_offset, np.int64)
    b1_l, b2_l, ct_l = [], [], []
    for b1, b2, ct in clr.pixel_chunks(10_000_000):
        b1_l.append(b1), b2_l.append(b2), ct_l.append(ct)
    b1 = np.concatenate(b1_l)
    b2 = np.concatenate(b2_l)
    ct = np.concatenate(ct_l).astype(float)
    c1 = np.searchsorted(offsets, b1, "right") - 1
    c2 = np.searchsorted(offsets, b2, "right") - 1
    keep = (c1 == c2) & ((b2 - b1) >= 2)
    b1, b2, ct = b1[keep], b2[keep], ct[keep]
    wf = np.where(np.isnan(w), 0.0, w)
    v = ct * wf[b1] * wf[b2]
    n = clr.n_bins
    marg = np.bincount(b1, weights=v, minlength=n) + np.bincount(
        b2, weights=v, minlength=n
    )
    inc = np.isfinite(w) & (marg > 0)
    assert np.abs(marg[inc] - 1.0).max() < 0.02


def test_ice_store_writes_weight_column(cool_copy):
    w = ice_balance(CoolFile(cool_copy), cis_only=True, store=True)
    stored = _stored_weights(cool_copy)
    assert np.allclose(stored, w, equal_nan=True)


def test_native_ice_iterate_matches_python_loop():
    """The native whole-loop kernel (cache-blocked marginals) and the
    per-iteration Python loop converge to the same weights: blocked
    summation only reorders float adds (~1e-14 relative)."""
    from chromosight_tpu import native
    from chromosight_tpu.ops.balance import _marginals

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.RandomState(3)
    n_bins, nnz = 40_000, 2_000_000  # > one 16k col block
    b1 = rng.randint(0, n_bins, nnz).astype(np.int32)
    b2 = rng.randint(0, n_bins, nnz).astype(np.int32)
    b1, b2 = np.minimum(b1, b2), np.maximum(b1, b2)
    ct = rng.poisson(4, nnz).astype(np.float32) + 1
    bias0 = np.ones(n_bins)
    bias0[rng.rand(n_bins) < 0.02] = 0.0  # excluded bins

    got = bias0.copy()
    res = native.ice_iterate(b1, b2, ct, got, 200, 1e-7)
    assert res is not None
    scale_n, var_n, iters_n = res

    want = bias0.copy()
    scale_p, var_p, iters_p = np.nan, np.inf, 0
    for _ in range(200):
        marg = _marginals(b1, b2, ct, want, n_bins)
        nzmarg = marg[marg != 0]
        if len(nzmarg) == 0:
            break
        scale_p = nzmarg.mean()
        adj = marg / scale_p
        adj[adj == 0] = 1.0
        want /= adj
        iters_p += 1
        var_p = float(((nzmarg / scale_p) - 1).var())
        if var_p < 1e-7:
            break

    assert iters_n == iters_p
    assert abs(scale_n - scale_p) / scale_p < 1e-12
    nz = want != 0
    assert np.array_equal(nz, got != 0)
    rel = np.abs(got[nz] - want[nz]) / np.abs(want[nz])
    assert rel.max() < 1e-10

    # the compressed-stream kernel (CSR indptr + u16 diagonals + u8
    # counts with exceptions) needs row-sorted pixels; check it against
    # the same oracle, with planted > 255 counts exercising the
    # exception list
    order = np.argsort(b1, kind="stable")
    b1s, b2s = b1[order], b2[order]
    cts = ct.copy()[order]
    cts[rng.rand(nnz) < 1e-3] = 400.0
    want2 = bias0.copy()
    for _ in range(40):
        marg = _marginals(b1s, b2s, cts, want2, n_bins)
        nzm = marg[marg != 0]
        if len(nzm) == 0:
            break
        s = nzm.mean()
        adj = marg / s
        adj[adj == 0] = 1.0
        want2 /= adj
        if float(((nzm / s) - 1).var()) < 1e-7:
            break
    got2 = bias0.copy()
    res2 = native.ice_iterate_csr(b1s, b2s, cts, got2, 40, 1e-7)
    assert res2 is not None
    nz2 = want2 != 0
    assert np.array_equal(nz2, got2 != 0)
    assert (np.abs(got2[nz2] - want2[nz2]) / np.abs(want2[nz2])).max() < 1e-10
    # unsorted rows are rejected (indptr would be wrong)
    assert native.ice_iterate_csr(b1s[::-1].copy(), b2s[::-1].copy(),
                                  cts[::-1].copy(), bias0.copy(), 5, 0.0) is None


def test_native_whole_loop_prep_matches_streaming_path(
    cool_copy, monkeypatch
):
    """The one-pass native prep (ice_prep_csr -> prebuilt compressed
    stream) must reproduce the streaming numpy pass-1 path's weights:
    same exclusion set, same values to f64 round-off of the raw-marginal
    summation order."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        pytest.skip("native tier unavailable")
    clr = CoolFile(cool_copy)
    monkeypatch.setenv("CHROMOSIGHT_TPU_ICE_NATIVE", "0")
    w_stream = ice_balance(clr, cis_only=True, store=False)
    monkeypatch.setenv("CHROMOSIGHT_TPU_ICE_NATIVE", "1")
    w_fast = ice_balance(clr, cis_only=True, store=False)
    assert np.array_equal(np.isnan(w_fast), np.isnan(w_stream))
    both = np.isfinite(w_fast)
    np.testing.assert_allclose(w_fast[both], w_stream[both], rtol=1e-9)


def test_ice_weights_deterministic_and_block_concurrency_safe(
    example_cool, tmp_path, monkeypatch
):
    """Multithreaded ICE must be bitwise run-to-run reproducible (the
    deterministic thread-ordered partial merge in kernels.cpp) and
    concurrent chromosome blocks must produce exactly the serial-loop
    weights (blocks are independent)."""
    cool = tmp_path / "det.cool"
    shutil.copy(example_cool, cool)

    monkeypatch.setenv("OMP_NUM_THREADS", "4")
    monkeypatch.setenv("CHROMOSIGHT_TPU_ICE_BLOCK_THREADS", "3")
    w_a = ice_balance(CoolFile(str(cool)), store=False)
    w_b = ice_balance(CoolFile(str(cool)), store=False)
    assert np.array_equal(w_a, w_b, equal_nan=True)

    monkeypatch.setenv("CHROMOSIGHT_TPU_ICE_BLOCK_THREADS", "1")
    w_serial = ice_balance(CoolFile(str(cool)), store=False)
    assert np.array_equal(w_a, w_serial, equal_nan=True)
