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
