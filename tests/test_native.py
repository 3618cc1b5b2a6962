"""Native C++ kernel tests: equivalence with the pure-numpy fallbacks."""

import numpy as np
import pytest

from chromosight_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_cc_label_matches_python(lib):
    rng = np.random.RandomState(0)
    n = 200
    mask = rng.rand(n, n) < 0.15
    rows, cols = np.nonzero(mask)
    got = native.cc_label(rows, cols, n)
    # scipy oracle
    import scipy.ndimage as ndi

    lab2d, _ = ndi.label(mask, structure=[[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    oracle = lab2d[rows, cols]
    # same partition (bijective mapping between label sets)
    import collections

    fwd, bwd = {}, {}
    for a, b in zip(got, oracle):
        assert fwd.setdefault(a, b) == b
        assert bwd.setdefault(b, a) == a
    # labels are the min pixel index per component
    for lbl in np.unique(got):
        members = np.flatnonzero(got == lbl)
        assert members.min() == lbl


def test_coo_to_band_matches_numpy(lib):
    rng = np.random.RandomState(1)
    n, w, nnz = 100, 20, 500
    rows = rng.randint(0, n, nnz)
    cols = rng.randint(0, n, nnz)
    vals = rng.rand(nnz)
    got = native.coo_to_band(rows, cols, vals, n, w)
    ref = np.zeros((n, w))
    d = cols - rows
    keep = (d >= 0) & (d < w)
    ref[rows[keep], d[keep]] = vals[keep]
    # duplicates resolve last-writer-wins in both (sequential scatter)
    assert np.allclose(got, ref)


def test_marginal_sums_matches_numpy(lib):
    rng = np.random.RandomState(2)
    n_bins, nnz = 50, 300
    b1 = rng.randint(0, n_bins, nnz)
    b2 = rng.randint(0, n_bins, nnz)
    ct = rng.rand(nnz)
    bias = rng.rand(n_bins)
    got = native.marginal_sums(b1, b2, ct, bias, n_bins)
    vals = ct * bias[b1] * bias[b2]
    ref = np.bincount(b1, weights=vals, minlength=n_bins) + np.bincount(
        b2, weights=vals, minlength=n_bins
    )
    assert np.allclose(got, ref)


def test_remove_neighbours_native_matches_python(lib, monkeypatch):
    """Grid-hashed native suppression == the greedy python fallback on
    random candidate sets (incl. score ties and NaN scores)."""
    import pandas as pd

    import chromosight_tpu.detection as cud

    rng = np.random.RandomState(7)
    n = 400
    pat = pd.DataFrame(
        {
            "bin1": rng.randint(0, 120, n),
            "bin2": rng.randint(0, 120, n),
            "score": np.round(rng.rand(n), 2),  # rounding forces ties
        }
    )
    pat.loc[rng.rand(n) < 0.05, "score"] = np.nan
    for win in (1, 3, 8):
        got = cud.remove_neighbours(pat, win_size=win)
        monkeypatch.setattr(
            "chromosight_tpu.native.remove_neighbours",
            lambda *a, **k: None,
        )
        want = cud.remove_neighbours(pat, win_size=win)
        monkeypatch.undo()
        assert np.array_equal(got, want), f"win={win}"


def test_remove_neighbours_win0_and_nondefault_index(lib, monkeypatch):
    """win_size=0 suppresses nothing (strict |d| < 0 can never hold) on
    both paths, and a non-RangeIndex frame is treated positionally —
    identical native/fallback results regardless of index labels."""
    import pandas as pd

    import chromosight_tpu.detection as cud

    pat = pd.DataFrame(
        {
            "bin1": [10, 10, 50, 51],
            "bin2": [10, 10, 50, 51],
            "score": [0.9, 0.8, 0.7, 0.6],
        },
        index=[3, 7, 9, 11],
    )
    for win in (0, 2):
        got = cud.remove_neighbours(pat, win_size=win)
        monkeypatch.setattr(
            "chromosight_tpu.native.remove_neighbours",
            lambda *a, **k: None,
        )
        want = cud.remove_neighbours(pat, win_size=win)
        monkeypatch.undo()
        assert np.array_equal(got, want), f"win={win}"
        if win == 0:
            assert got.all()
        else:
            assert got.tolist() == [True, False, True, False]


def test_remove_neighbours_fallback_matches_quadratic_oracle():
    """The grid-hashed numpy fallback == a literal transcription of the
    reference's O(n^2) greedy semantics (detection.py:348-384: process by
    descending score, suppress everything within win_size in both axes),
    on random candidates with ties and NaN scores."""
    import chromosight_tpu.detection as cud

    def oracle(b1, b2, sc, win):
        n = len(b1)
        order = np.lexsort((np.arange(n), -sc))
        nan_mask = np.isnan(sc[order])
        order = np.concatenate([order[~nan_mask], order[nan_mask]])
        killed = np.zeros(n, dtype=bool)
        for i in order:
            if killed[i]:
                continue
            close = (np.abs(b1 - b1[i]) < win) & (np.abs(b2 - b2[i]) < win)
            close[i] = False
            killed |= close
        return ~killed

    rng = np.random.RandomState(11)
    for n, span in ((1, 10), (500, 150), (2000, 40_000)):
        b1 = rng.randint(0, span, n).astype(np.int64)
        b2 = rng.randint(0, span, n).astype(np.int64)
        sc = np.round(rng.rand(n), 2)
        sc[rng.rand(n) < 0.05] = np.nan
        for win in (1, 5, 13):
            got = cud._remove_neighbours_numpy(b1, b2, sc, win)
            assert np.array_equal(got, oracle(b1, b2, sc, win)), (n, win)


def test_get_lib_thread_consistent(monkeypatch):
    """Concurrent first callers must all see the SAME library object:
    before the load completed, racing threads used to observe the tried
    flag without the handle and silently took the numpy/f32 fallback
    paths for their whole call (nondeterministic upload-byte inflation
    in the threaded genome pipeline)."""
    import threading
    import time

    from chromosight_tpu import native

    orig_load = native._load

    def slow_load():
        time.sleep(0.3)  # widen the former race window
        return orig_load()

    monkeypatch.setattr(native, "_load", slow_load)
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    results = []

    def call():
        results.append(native.get_lib())

    threads = [threading.Thread(target=call) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    assert len({id(r) for r in results}) == 1, "threads saw mixed states"
