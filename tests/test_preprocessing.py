"""Preprocessing tests on the real example.cool fixture plus synthetic
cases, mirroring the reference tests/test_preprocessing.py."""

import numpy as np
import pytest
import scipy.sparse as sp

import chromosight_tpu.preprocessing as cup
from chromosight_tpu.io import load_cool


@pytest.fixture(scope="module")
def fixture_mat(example_cool):
    mat, chroms, bins, binsize = load_cool(example_cool)
    return mat.tocsr()


def test_get_detectable_bins_drops_dead_bin(fixture_mat):
    mat = fixture_mat.copy().tolil()
    dead = 42
    mat[dead, :] = 0
    mat[:, dead] = 0
    mat = mat.tocsr()
    # symmetrize upper triangle for bin-sum semantics
    good_rows, good_cols = cup.get_detectable_bins(mat.tocoo(), n_mads=3)
    assert dead not in good_rows
    assert np.array_equal(good_rows, good_cols)


def test_get_detectable_bins_inter():
    rng = np.random.RandomState(0)
    mat = sp.coo_matrix(rng.poisson(5, size=(40, 60)).astype(float))
    rows, cols = cup.get_detectable_bins(mat, n_mads=3, inter=True)
    assert rows.max() < 40 and cols.max() < 60


def test_diag_trim_sparse():
    mat = sp.csr_matrix(np.ones((10, 10)))
    trimmed = cup.diag_trim(mat, 3)
    dense = trimmed.toarray()
    i, j = np.indices(dense.shape)
    assert np.all(dense[(j - i >= 0) & (j - i <= 3)] == 1)
    assert np.all(dense[(j - i < 0) | (j - i > 3)] == 0)


def test_diag_trim_dense_keeps_lower():
    mat = np.ones((8, 8))
    trimmed = cup.diag_trim(mat, 2)
    i, j = np.indices(mat.shape)
    # dense semantics: upper diagonals >= n zeroed, lower triangle untouched
    assert np.all(trimmed[(j - i) >= 2] == 0)
    assert np.all(trimmed[(j - i) < 2] == 1)


def test_distance_law_simple():
    m = np.ones((3, 3))
    m += np.array([1, 2, 3])
    law = cup.distance_law(sp.csr_matrix(np.triu(m)), smooth=False)
    assert np.allclose(law, [3.0, 3.5, 4.0])


def test_distance_law_detectable_and_maxdist(fixture_mat):
    n = fixture_mat.shape[0]
    detectable = np.arange(0, n, 2)
    law = cup.distance_law(
        fixture_mat, detectable_bins=detectable, max_dist=50, smooth=False
    )
    assert len(law) == n
    assert np.all(law[51:] == 0)
    # with every-other-bin detectable, only even diagonals have data
    assert np.all(law[:20:2] > 0)
    assert np.all(np.isnan(law[1:20:2]))


def test_distance_law_isotonic_decreasing(fixture_mat):
    law = cup.distance_law(fixture_mat, max_dist=200, smooth=True)
    diffs = np.diff(law[:200])
    assert np.all(diffs <= 1e-12)


def test_pava_matches_sklearn():
    from sklearn.isotonic import IsotonicRegression

    rng = np.random.RandomState(3)
    y = rng.rand(50) * np.linspace(2, 1, 50)
    ours = cup.pava_decreasing(y)
    ir = IsotonicRegression(increasing=False)
    theirs = ir.fit_transform(np.arange(50), y)
    assert np.allclose(ours, theirs)


def test_detrend_flattens_diagonals(fixture_mat):
    detrended = cup.detrend(fixture_mat.tocsr())
    # Per-diagonal means should be ~1 after detrending
    for d in [1, 5, 20]:
        diag = detrended.diagonal(d)
        diag = diag[diag > 0]
        assert abs(np.mean(diag) - 1.0) < 0.5


def test_detrend_max_val_quirk():
    # Values >= max_val are reset to exactly 1, not clipped: with law(d=1)
    # = mean(1e6, 1*8) ~ 1.25e5, the big pixel maps to ~8 < 10 (kept), but
    # scaling it up pushes the ratio over max_val and must yield exactly 1.
    mat2 = sp.csr_matrix(np.diag(np.ones(9), 1) * 1.0)
    mat2 = mat2.tolil()
    mat2[0, 1] = 1e6
    out = cup.detrend(mat2.tocsr(), max_val=8, smooth=False)
    assert out[0, 1] == 1.0
    # untouched small entries are divided by the law, not reset
    assert 0 < out[1, 2] < 1


def test_ztransform():
    rng = np.random.RandomState(0)
    mat = sp.coo_matrix(rng.rand(20, 20))
    z = cup.ztransform(mat)
    assert abs(z.data.mean()) < 1e-10
    assert abs(z.data.std() - 1) < 1e-10


def test_sum_mat_bins():
    m = np.triu(np.ones((4, 4)))
    sums = cup.sum_mat_bins(sp.csr_matrix(m))
    # full-symmetric equivalent row sums
    full = np.ones((4, 4))
    assert np.allclose(sums, full.sum(axis=0))


def test_subsample_contacts_proportion():
    rng = np.random.RandomState(0)
    mat = sp.coo_matrix(rng.poisson(10, size=(50, 50)).astype(float))
    total = mat.data.sum()
    np.random.seed(1)
    sub = cup.subsample_contacts(mat, int(0.3 * total))
    assert sub.data.sum() == int(0.3 * total)
    # subsampled counts never exceed originals
    orig = mat.tocsr()
    subc = sub.tocsr()
    diff = (orig - subc).toarray()
    assert diff.min() >= 0


def test_make_missing_mask_sym_upper():
    valid = np.array([0, 2, 4])
    mask = cup.make_missing_mask((5, 5), valid, valid, max_dist=1, sym_upper=True)
    dense = mask.toarray()
    expected = np.array(
        [
            [0, 1, 0, 0, 0],
            [0, 1, 1, 0, 0],
            [0, 0, 0, 1, 0],
            [0, 0, 0, 1, 1],
            [0, 0, 0, 0, 0],
        ],
        dtype=bool,
    )
    assert np.array_equal(dense, expected)


def test_make_missing_mask_full_cross():
    valid_r = np.array([0, 1, 3])
    valid_c = np.array([1, 2])
    mask = cup.make_missing_mask((4, 3), valid_r, valid_c, sym_upper=False)
    dense = mask.toarray()
    assert dense[2, :].all()
    assert dense[:, 0].all()
    assert not dense[0, 1]


def test_frame_missing_mask_margins():
    mask = sp.csr_matrix(np.zeros((10, 10), dtype=bool))
    framed = cup.frame_missing_mask(mask, (3, 3), sym_upper=False)
    dense = framed.toarray()
    assert dense.shape == (14, 14)
    assert dense[:2, :].all() and dense[-2:, :].all()
    assert dense[:, :2].all() and dense[:, -2:].all()
    assert not dense[2:-2, 2:-2].any()


def test_frame_missing_mask_sym_upper_banded():
    mask = sp.csr_matrix(np.zeros((20, 20), dtype=bool))
    framed = cup.frame_missing_mask(mask, (3, 3), sym_upper=True, max_dist=5)
    dense = framed.toarray()
    # lower diagonals -1..-3 are masked
    i, j = np.indices(dense.shape)
    band = (j - i >= -3) & (j - i <= -1)
    assert dense[band].all()
    # bottom margin stays clear beyond the band
    assert not dense[-1, : dense.shape[1] - 12].any()


def test_zero_pad_sparse():
    m = sp.csr_matrix(np.array([[1, 2], [10, 20]]))
    padded = cup.zero_pad_sparse(m, 2, 1)
    expected = np.array(
        [
            [0, 0, 0, 0, 0, 0],
            [0, 0, 1, 2, 0, 0],
            [0, 0, 10, 20, 0, 0],
            [0, 0, 0, 0, 0, 0],
        ]
    )
    assert np.array_equal(padded.toarray(), expected)


def test_crop_kernel_odd_and_centered():
    k = np.arange(81).reshape(9, 9).astype(float)
    cropped = cup.crop_kernel(k, (5, 5))
    assert cropped.shape == (5, 5)
    assert cropped[2, 2] == k[4, 4]
    # even targets are bumped to next odd
    cropped = cup.crop_kernel(k, (4, 4))
    assert cropped.shape == (5, 5)


def test_resize_kernel_invariants():
    k = np.random.RandomState(0).rand(17, 17)
    small = cup.resize_kernel(k, kernel_res=2000, signal_res=5000)
    assert small.shape[0] % 2 == 1
    assert small.shape[0] < 17
    big = cup.resize_kernel(k, kernel_res=2000, signal_res=1000, quiet=True)
    assert big.shape[0] % 2 == 1
    assert big.shape[0] > 17
    # min_size floor
    tiny = cup.resize_kernel(k, factor=0.1, quiet=True)
    assert tiny.shape[0] >= 7


def test_factorise_kernel_reconstruction():
    k = np.random.RandomState(1).rand(17, 17)
    left, right = cup.factorise_kernel(k, prop_info=1.0 - 1e-12)
    assert np.allclose(left @ right, k, atol=1e-8)
    left2, right2 = cup.factorise_kernel(k, prop_info=0.9)
    assert left2.shape[1] < left.shape[1]


def test_valid_to_missing():
    missing = cup.valid_to_missing(np.array([0, 2]), 5)
    assert missing.tolist() == [1, 3, 4]
    # empty valid set
    missing = cup.valid_to_missing(np.array([], dtype=int), 3)
    assert missing.tolist() == [0, 1, 2]


def test_erase_missing_sym():
    mat = sp.csr_matrix(np.ones((5, 5)))
    valid = np.array([0, 1, 3, 4])
    erased = cup.erase_missing(mat, valid, valid, sym_upper=True)
    dense = erased.toarray()
    assert not dense[2, :].any()
    assert not dense[:, 2].any()
    assert dense[0, 1] == 1


def test_subsample_contacts_seeded_rng_parity():
    """Seeded RNG-level parity with the reference algorithm
    (preprocessing.py:359-401): same np.random state -> bit-identical
    sampled matrix, because the implementation consumes the global RNG
    exactly like the reference (one choice() call without replacement
    over the cumulative-count space).  Also: per-diagonal means track the
    original's decay within sampling noise."""
    import scipy.sparse as sp

    rng = np.random.RandomState(5)
    n = 150
    i, j = np.triu_indices(n, k=1)
    keep = rng.rand(len(i)) < 0.4
    i, j = i[keep], j[keep]
    vals = rng.poisson(8, len(i)).astype(np.float64) + 1
    mat = sp.coo_matrix((vals, (i, j)), shape=(n, n))
    target = int(0.35 * vals.sum())

    def reference_transcription(M, n_contacts):
        S = M.data.copy()
        cum_counts = np.cumsum(S)
        tot_contacts = int(cum_counts[-1])
        sampled = np.random.choice(
            int(tot_contacts), size=(n_contacts), replace=False
        )
        idx = np.searchsorted(cum_counts, sampled, side="right")
        counts = np.bincount(idx, minlength=S.shape[0])
        nz = counts > 0
        return sp.coo_matrix(
            (counts[nz].astype(np.float64), (M.row[nz], M.col[nz])),
            shape=M.shape,
        )

    np.random.seed(1234)
    ours = cup.subsample_contacts(mat, target).tocsr()
    np.random.seed(1234)
    want = reference_transcription(mat, target).tocsr()
    assert (ours != want).nnz == 0
    assert ours.sum() == target

    # statistical sanity: per-diagonal sampled means scale by ~target/total
    ratio = target / vals.sum()
    dd = j - i
    orig_by_d = np.bincount(dd, weights=vals, minlength=n)
    o = ours.tocoo()
    sub_by_d = np.bincount(o.col - o.row, weights=o.data, minlength=n)
    big = orig_by_d > 200
    rel = sub_by_d[big] / orig_by_d[big]
    assert np.abs(rel - ratio).max() < 0.12
