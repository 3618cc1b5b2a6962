"""Runtime-class tests: DumpMatrix, HicGenome submatrix bookkeeping,
normalization modes, coordinate conversions (mirrors reference
tests/test_contacts_map.py)."""

import glob
import shutil

import numpy as np
import pandas as pd
import pytest

import chromosight_tpu.kernels as ck
from chromosight_tpu.runtime import DumpMatrix, HicGenome


@pytest.fixture()
def genome(example_cool, tmp_path):
    # Work on a private copy since normalize(force) writes weights in place
    path = str(tmp_path / "example.cool")
    shutil.copy(example_cool, path)
    return HicGenome(path, kernel_config=dict(ck.loops))


def test_dump_matrix_decorator(tmp_path):
    class Obj:
        dump = str(tmp_path)
        name = "x"
        matrix = np.ones((3, 3))

        @DumpMatrix("01_stage")
        def method(self):
            return 42

    o = Obj()
    assert o.method() == 42
    assert glob.glob(str(tmp_path / "x_01_stage.npz"))


def test_dump_matrix_disabled(tmp_path):
    class Obj:
        dump = None
        matrix = np.ones((3, 3))

        @DumpMatrix("01_stage")
        def method(self):
            return 1

    Obj().method()
    assert not glob.glob(str(tmp_path / "*.npz"))


def test_hic_genome_metadata(genome):
    assert genome.clr.binsize == 1000
    assert genome.max_dist == 2000000 // 1000
    assert genome.largest_kernel == 17


def test_make_sub_matrices_intra_only(genome):
    genome.normalize(norm="auto")
    genome.make_sub_matrices()
    assert genome.sub_mats.shape[0] == 3
    assert set(genome.sub_mats.chr1) == {"chr1", "chr2", "chr3"}
    for _, row in genome.sub_mats.iterrows():
        assert row.chr1 == row.chr2
        assert not row.contact_map.inter


def test_make_sub_matrices_inter(example_cool, tmp_path):
    path = str(tmp_path / "e.cool")
    shutil.copy(example_cool, path)
    g = HicGenome(path, inter=True, kernel_config=dict(ck.loops))
    g.normalize(norm="auto")
    g.make_sub_matrices()
    # 3 intra + 3 inter pairs
    assert g.sub_mats.shape[0] == 6
    inter_count = sum(
        1 for _, r in g.sub_mats.iterrows() if r.contact_map.inter
    )
    assert inter_count == 3


def test_normalize_modes(genome):
    genome.normalize(norm="auto")
    assert genome.use_norm
    genome.normalize(norm="raw")
    assert not genome.use_norm
    with pytest.raises(ValueError):
        genome.normalize(norm="bogus")
    assert len(genome.detectable_bins) > 0


def test_normalize_force_recomputes(genome):
    genome.normalize(norm="force")
    w = genome.bins.weight.to_numpy()
    assert np.isfinite(w).sum() > 600
    # balanced marginals should be ~1 on detectable bins
    rows, cols, vals = genome.clr.pixels_coo((0, 127), (0, 127), balance=True)
    n = 127
    dense = np.zeros((n, n))
    dense[rows, cols] = np.nan_to_num(vals)
    # zero out first two diagonals (ignored during balancing)
    i, j = np.indices((n, n))
    dense[np.abs(i - j) < 2] = 0
    marg = dense.sum(axis=0)
    marg = marg[marg > 0.1]
    assert abs(np.median(marg) - 1.0) < 0.15


def test_coordinate_conversions(genome):
    pat = pd.DataFrame({"bin1": [5], "bin2": [10]})
    full = genome.get_full_mat_pattern("chr2", "chr2", pat)
    assert full.bin1[0] == 5 + 127
    back = genome.get_sub_mat_pattern("chr2", "chr2", full)
    assert back.bin1[0] == 5

    coords = genome.bins_to_coords([0, 127, 549])
    assert list(coords.chrom.astype(str)) == ["chr1", "chr2", "chr3"]
    assert list(coords.start) == [0, 0, 0]

    df = pd.DataFrame({"chrom": ["chr2"], "pos": [1500]})
    bins = genome.coords_to_bins(df)
    assert bins[0] == 127 + 1


def test_coords_to_bins_out_of_range(genome):
    df = pd.DataFrame({"chrom": ["chrX"], "pos": [1500]})
    bins = genome.coords_to_bins(df)
    assert np.isnan(bins[0])


def test_contact_map_preprocessing(genome):
    genome.normalize(norm="auto")
    genome.make_sub_matrices()
    cm = genome.sub_mats.contact_map[0]
    cm.create_mat()
    dense = cm.dense
    assert dense.shape == (127, 127)
    # upper band only after remove_diags
    i, j = np.indices(dense.shape)
    assert not dense[(j - i) < 0].any()
    assert not np.isnan(dense).any()
    # detrended values hover around 1 on near diagonals
    d5 = dense[np.abs(j - i) == 5]
    d5 = d5[d5 > 0]
    assert 0.2 < np.mean(d5) < 3.0
    cm.destroy_mat()
    assert cm.dense is None


def test_contact_map_subsample(genome):
    genome.normalize(norm="raw")
    genome.make_sub_matrices()
    cm = genome.sub_mats.contact_map[0]
    cm.sample = 0.5
    np.random.seed(0)
    cm.create_mat()
    assert cm.dense is not None


def test_gather_sub_matrices(genome):
    genome.normalize(norm="auto")
    genome.make_sub_matrices()
    for _, row in genome.sub_mats.iterrows():
        row.contact_map.create_mat()
    gathered = genome.gather_sub_matrices()
    assert gathered.shape == (720, 720)
    assert gathered.nnz > 0


def test_normalize_auto_balances_when_no_weights(tmp_path):
    """norm=auto must trigger ICE balancing when the file has no weight
    column (reference contacts_map.py:205-223)."""
    import pandas as pd

    from chromosight_tpu.io.cool import CoolFile, create_cool

    rng = np.random.RandomState(0)
    n = 60
    rows, cols = np.triu_indices(n)
    counts = rng.poisson(20, size=len(rows)) + 1
    bins = pd.DataFrame(
        {
            "chrom": ["c1"] * n,
            "start": np.arange(n) * 1000,
            "end": (np.arange(n) + 1) * 1000,
        }
    )
    pixels = pd.DataFrame(
        {"bin1_id": rows, "bin2_id": cols, "count": counts}
    )
    path = str(tmp_path / "noweights.cool")
    create_cool(path, bins, pixels)
    assert CoolFile(path).weights is None
    g = HicGenome(path, kernel_config=dict(ck.loops_small))
    g.normalize(norm="auto")
    w = CoolFile(path).weights
    assert w is not None and np.isfinite(w).sum() > 40
    assert len(g.detectable_bins) > 40


def test_normalize_force_trans_inclusive(example_cool, tmp_path):
    """--inter + norm=force balances genome-wide (trans pixels included),
    mirroring cooler's cis_only=False mode (contacts_map.py:209-219)."""
    path = str(tmp_path / "e.cool")
    shutil.copy(example_cool, path)
    g = HicGenome(path, inter=True, kernel_config=dict(ck.loops))
    g.normalize(norm="force")
    w = g.bins.weight.to_numpy()
    assert np.isfinite(w).sum() > 600
    # balanced genome-wide marginals ~ constant
    from chromosight_tpu.io.cool import CoolFile

    clr = CoolFile(path)
    marg = np.zeros(720)
    for b1, b2, ct in clr.pixel_chunks():
        d = np.abs(b1 - b2)
        keep = d >= 2
        v = ct[keep] * w[b1[keep]] * w[b2[keep]]
        v = np.nan_to_num(v)
        np.add.at(marg, b1[keep], v)
        np.add.at(marg, b2[keep], v)
    nz = marg[marg > 0.1]
    assert abs(np.median(nz) - 1.0) < 0.2


def test_narrow_upload_band_identical(example_cool, tmp_path, monkeypatch):
    """Uploading only keep_distance+1 band columns (padding to the bucket
    on device) must produce a band_dev identical to the full-width
    upload, bf16 off."""
    import shutil

    import chromosight_tpu.kernels as ck
    from chromosight_tpu.runtime.genome import HicGenome

    path = str(tmp_path / "example.cool")
    shutil.copy(example_cool, path)

    def build():
        hg = HicGenome(path, kernel_config=dict(ck.loops))
        hg.normalize("auto")
        hg.compute_max_dist()
        hg.make_sub_matrices()
        sub = hg.sub_mats.iloc[0]
        sub.contact_map.create_mat()
        return np.asarray(sub.contact_map.band_dev)

    monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_UPLOAD", "0")
    monkeypatch.setenv("CHROMOSIGHT_TPU_NARROW_UPLOAD", "0")
    full = build()
    monkeypatch.setenv("CHROMOSIGHT_TPU_NARROW_UPLOAD", "1")
    monkeypatch.setenv("CHROMOSIGHT_TPU_NARROW_MIN_ROWS", "0")
    narrow = build()
    assert full.shape == narrow.shape
    assert np.array_equal(full, narrow)


def test_bf16_upload_flag(example_cool, tmp_path, monkeypatch):
    """CHROMOSIGHT_TPU_UPLOAD_DTYPE=bf16 halves upload bytes; values are
    f32 on device and within bf16 rounding of the exact band."""
    import shutil

    import chromosight_tpu.kernels as ck
    from chromosight_tpu.runtime.genome import HicGenome

    path = str(tmp_path / "example.cool")
    shutil.copy(example_cool, path)

    def build():
        hg = HicGenome(path, kernel_config=dict(ck.loops))
        hg.normalize("auto")
        hg.compute_max_dist()
        hg.make_sub_matrices()
        sub = hg.sub_mats.iloc[0]
        sub.contact_map.create_mat()
        return np.asarray(sub.contact_map.band_dev)

    monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_UPLOAD", "0")
    exact = build()
    monkeypatch.setenv("CHROMOSIGHT_TPU_UPLOAD_DTYPE", "bf16")
    monkeypatch.setenv("CHROMOSIGHT_TPU_NARROW_MIN_ROWS", "0")
    approx = build()
    assert approx.dtype == np.float32
    denom = np.maximum(np.abs(exact), 1e-30)
    rel = np.abs(approx - exact) / denom
    assert rel[exact != 0].max() < 2 ** -7  # bf16 rounding through detrend


def test_count_upload_band_matches_f32_path(example_cool, tmp_path, monkeypatch):
    """The exact-uint16 count upload (raw counts + on-device weight
    product, ops/band.py:band_weighted_finalize) must reproduce the
    balanced f32 upload path within f32 weight-product rounding, for
    both balanced and raw norms."""
    import shutil

    import chromosight_tpu.kernels as ck
    from chromosight_tpu.runtime.genome import HicGenome

    path = str(tmp_path / "example.cool")
    shutil.copy(example_cool, path)

    def build(norm):
        hg = HicGenome(path, kernel_config=dict(ck.loops))
        hg.normalize(norm)
        hg.compute_max_dist()
        hg.make_sub_matrices()
        sub = hg.sub_mats.iloc[0]
        sub.contact_map.create_mat()
        return np.asarray(sub.contact_map.band_dev)

    for norm in ("auto", "raw"):
        monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_UPLOAD", "0")
        exact = build(norm)
        monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_UPLOAD", "1")
        monkeypatch.setenv("CHROMOSIGHT_TPU_NARROW_MIN_ROWS", "0")
        got = build(norm)
        assert got.shape == exact.shape
        if norm == "raw":
            # raw counts are exact in uint16 -> f32
            assert np.array_equal(got, exact), "raw norm must be bitwise"
        else:
            # f32 weight product vs the host's f64 product: ~ulp-level
            denom = np.maximum(np.abs(exact), 1e-30)
            rel = np.abs(got - exact) / denom
            assert rel[exact != 0].max() < 1e-5


def test_band_scatter_counts_overflow_falls_back():
    """Counts that do not fit uint16 must return None (callers fall back
    to the f32 scatter)."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native tier unavailable")
    b1 = np.array([0, 1, 2], dtype=np.int64)
    b2 = np.array([0, 2, 3], dtype=np.int64)
    good = np.array([5, 9, 65535], dtype=np.int32)
    band = native.band_scatter_counts(b1, b2, good, 0, 4, 8, n_rows=4)
    assert band is not None and band.dtype == np.uint16
    assert band[0, 0] == 5 and band[1, 1] == 9 and band[2, 1] == 65535
    over = np.array([5, 9, 65536], dtype=np.int32)
    assert native.band_scatter_counts(b1, b2, over, 0, 4, 8, n_rows=4) is None
    # float-stored INTEGRAL counts are eligible (cooler allows float
    # count columns); fractional values are not
    fband = native.band_scatter_counts(
        b1, b2, good.astype(np.float64), 0, 4, 8, n_rows=4
    )
    assert fband is not None and np.array_equal(fband, band)
    frac = np.array([5.0, 9.5, 7.0])
    assert native.band_scatter_counts(b1, b2, frac, 0, 4, 8, n_rows=4) is None


def test_band_scatter_counts_indptr_matches_coo():
    """The indptr-driven scatter (bin1 ids implied by the cool CSR index,
    bin1_id dataset never read) must match the COO variant exactly,
    including the overflow/fractional fallback contract."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(7)
    n, width, s, e = 64, 16, 8, 56
    # random upper-band pixels sorted by (bin1, bin2), CSR-indexed
    b1 = np.sort(rng.integers(0, n, 400)).astype(np.int64)
    b2 = np.minimum(b1 + rng.integers(0, 24, 400), n - 1).astype(np.int64)
    order = np.lexsort((b2, b1))
    b1, b2 = b1[order], b2[order]
    ct = rng.integers(1, 1000, 400).astype(np.int32)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, b1 + 1, 1)
    indptr = np.cumsum(indptr)
    lo, hi = indptr[s], indptr[e]
    want = native.band_scatter_counts(
        b1[lo:hi], b2[lo:hi], ct[lo:hi], s, e, width, n_rows=e - s + 3
    )
    got = native.band_scatter_counts_indptr(
        indptr[s : e + 1], b2[lo:hi], ct[lo:hi], s, e, width,
        n_rows=e - s + 3,
    )
    assert want is not None and got is not None
    assert np.array_equal(got, want)
    # overflow propagates the same None fallback
    ct_over = ct.copy()
    ct_over[lo] = 70000
    assert (
        native.band_scatter_counts_indptr(
            indptr[s : e + 1], b2[lo:hi], ct_over[lo:hi], s, e, width
        )
        is None
    )
    # the production entry point: CoolFile.band_upper_counts rides indptr
    import pandas as pd

    from chromosight_tpu.io.cool import CoolFile, create_cool
    import tempfile, os

    bins = pd.DataFrame(
        {
            "chrom": ["c1"] * n,
            "start": np.arange(n) * 1000,
            "end": (np.arange(n) + 1) * 1000,
        }
    )
    pix = pd.DataFrame({"bin1_id": b1, "bin2_id": b2, "count": ct})
    pix = pix.groupby(["bin1_id", "bin2_id"], as_index=False)["count"].sum()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.cool")
        create_cool(path, bins, pix)
        cf = CoolFile(path)
        band = cf.band_upper_counts((s, e), width, n_rows=e - s + 3)
        dense = cf.band_upper((s, e), width, n_rows=e - s + 3)
    assert band is not None
    assert np.array_equal(band.astype(np.float32), dense)


def test_band_scatter_counts_u8_exceptions():
    """uint8 + exceptions scatter: counts <= 255 inline, larger counts in
    the (flat index, value) exception list, with the same non-integral /
    out-of-range None contract as the uint16 path."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native tier unavailable")
    n, width, s, e = 8, 8, 0, 8
    indptr = np.array([0, 2, 3, 3, 4, 4, 4, 4, 4], dtype=np.int64)
    b2 = np.array([0, 3, 2, 3], dtype=np.int64)
    ct = np.array([5, 300, 70000, 255], dtype=np.int64)
    out = native.band_scatter_counts_u8_indptr(
        indptr, b2, ct, s, e, width, n_rows=n
    )
    assert out is not None
    band, exc_idx, exc_val = out
    assert band.dtype == np.uint8
    assert band[0, 0] == 5 and band[3, 0] == 255
    # 300 and 70000 (both > 255, 70000 also > uint16!) ride exceptions
    assert len(exc_idx) == 2
    flat = {int(i): float(v) for i, v in zip(exc_idx, exc_val)}
    assert flat[0 * width + 3] == 300.0
    assert flat[1 * width + 1] == 70000.0
    assert band[0, 3] == 0 and band[1, 1] == 0
    # fractional -> None; > 2^24 -> None
    frac = np.array([5.0, 9.5, 7.0, 1.0])
    assert (
        native.band_scatter_counts_u8_indptr(
            indptr, b2, frac, s, e, width, n_rows=n
        )
        is None
    )
    huge = np.array([5, (1 << 24) + 1, 7, 1], dtype=np.int64)
    assert (
        native.band_scatter_counts_u8_indptr(
            indptr, b2, huge, s, e, width, n_rows=n
        )
        is None
    )
    # exception capacity exceeded -> None (caller ships uint16 instead)
    assert (
        native.band_scatter_counts_u8_indptr(
            indptr, b2, ct, s, e, width, n_rows=n, exc_cap=1
        )
        is None
    )


def test_band_upper_counts_auto_prefers_u8(tmp_path):
    """The auto fetch returns the u8 pack when counts qualify, and its
    device finalize reproduces the f32 band bit for bit (exceptions
    included)."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native tier unavailable")
    import pandas as pd

    from chromosight_tpu.io.cool import CoolFile, create_cool
    from chromosight_tpu.ops.band import band_counts_finalize_u8

    rng = np.random.default_rng(11)
    n, width = 48, 16
    b1 = np.sort(rng.integers(0, n, 300)).astype(np.int64)
    b2 = np.minimum(b1 + rng.integers(0, width, 300), n - 1).astype(np.int64)
    ct = rng.integers(1, 240, 300).astype(np.int64)
    ct[::37] = 999  # sprinkle exceptions
    pix = pd.DataFrame({"bin1_id": b1, "bin2_id": b2, "count": ct})
    pix = pix.groupby(["bin1_id", "bin2_id"], as_index=False)["count"].sum()
    bins = pd.DataFrame(
        {
            "chrom": ["c1"] * n,
            "start": np.arange(n) * 1000,
            "end": (np.arange(n) + 1) * 1000,
        }
    )
    path = str(tmp_path / "u8.cool")
    create_cool(path, bins, pix)
    cf = CoolFile(path)
    pack = cf.band_upper_counts_auto((0, n), width, n_rows=n)
    assert pack is not None and pack[0] == "u8"
    _, band8, exc_idx, exc_val = pack
    assert len(exc_idx) > 0  # the sprinkled exceptions actually rode
    dense = cf.band_upper((0, n), width, n_rows=n)
    cap = 512
    idx_up = np.full(cap, n * width, np.int32)
    val_up = np.zeros(cap, np.float32)
    idx_up[: len(exc_idx)] = exc_idx
    val_up[: len(exc_idx)] = exc_val
    got = np.asarray(band_counts_finalize_u8(
        band8, idx_up, val_up, width
    ))
    assert np.array_equal(got, dense)
    # u8 disabled -> u16 pack with identical values
    pack16 = cf.band_upper_counts_auto((0, n), width, n_rows=n, allow_u8=False)
    assert pack16 is not None and pack16[0] == "u16"
    assert np.array_equal(got, pack16[1].astype(np.float32))


def test_count_upload_u8_matches_u16_bitwise(
    example_cool, tmp_path, monkeypatch
):
    """End-to-end create_mat: the u8 + exceptions upload must produce a
    device band BITWISE equal to the uint16 upload's (same f32 weight
    product on device), for balanced and raw norms."""
    import shutil

    import chromosight_tpu.kernels as ck
    from chromosight_tpu.runtime.genome import HicGenome

    path = str(tmp_path / "example.cool")
    shutil.copy(example_cool, path)
    monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_UPLOAD", "1")
    monkeypatch.setenv("CHROMOSIGHT_TPU_NARROW_MIN_ROWS", "0")

    def build(norm):
        hg = HicGenome(path, kernel_config=dict(ck.loops))
        hg.normalize(norm)
        hg.compute_max_dist()
        hg.make_sub_matrices()
        sub = hg.sub_mats.iloc[0]
        sub.contact_map.create_mat()
        return np.asarray(sub.contact_map.band_dev)

    monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_U4", "0")  # pin the u8 path
    for norm in ("auto", "raw"):
        monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_U8", "0")
        want = build(norm)
        monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_U8", "1")
        got = build(norm)
        assert np.array_equal(got, want), norm


def test_band_scatter_counts_u4_split_and_exceptions():
    """Split u8-head / nibble-packed-tail scatter: head columns [0, d0)
    inline up to 255, tail columns pack two 4-bit counts per byte (even
    column -> low nibble), larger counts ride the flat-unpacked-index
    exception list, with the u8 path's non-integral / out-of-range /
    capacity None contract."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native tier unavailable")
    n, width, d0, s, e = 8, 8, 2, 0, 8
    indptr = np.array([0, 4, 5, 6, 7, 7, 7, 7, 7], dtype=np.int64)
    #        row 0: cols 0 (head, 200), 2 (tail even, 9), 3 (tail odd,
    #        12), 5 (tail, 99 -> exception); row 1: col 1 (head d=0,
    #        300 -> head exception); row 2: col 4 (tail d=2, 15); row 3:
    #        col 4 (head d=1, 255)
    b2 = np.array([0, 2, 3, 5, 1, 4, 4], dtype=np.int64)
    ct = np.array([200, 9, 12, 99, 300, 15, 255], dtype=np.int64)
    out = native.band_scatter_counts_u4_indptr(
        indptr, b2, ct, s, e, width, d0, n_rows=n
    )
    assert out is not None
    head, tail, exc_idx, exc_val = out
    assert head.shape == (n, d0) and head.dtype == np.uint8
    assert tail.shape == (n, (width - d0 + 1) // 2)
    assert head[0, 0] == 200 and head[3, 1] == 255
    # tail col t=d-d0: row 0 has t=0 -> low nibble of byte 0, t=1 ->
    # high nibble of byte 0; row 2's col 4 is d=2 -> t=0, byte 0
    assert tail[0, 0] == 9 | (12 << 4)
    assert tail[2, 0] == 15
    flat = {int(i): float(v) for i, v in zip(exc_idx, exc_val)}
    assert flat == {0 * width + 5: 99.0, 1 * width + 0: 300.0}
    # fractional and > 2^24 values -> None; tiny capacity -> None
    frac = ct.astype(np.float64).copy()
    frac[1] = 9.5
    assert (
        native.band_scatter_counts_u4_indptr(
            indptr, b2, frac, s, e, width, d0, n_rows=n
        )
        is None
    )
    huge = ct.copy()
    huge[0] = (1 << 24) + 1
    assert (
        native.band_scatter_counts_u4_indptr(
            indptr, b2, huge, s, e, width, d0, n_rows=n
        )
        is None
    )
    assert (
        native.band_scatter_counts_u4_indptr(
            indptr, b2, ct, s, e, width, d0, n_rows=n, exc_cap=1
        )
        is None
    )


def test_band_upper_counts_auto_prefers_u4(tmp_path, monkeypatch):
    """The auto fetch returns the u4 split pack for wide bands and its
    device finalize reproduces the f32 band bit for bit (head and tail
    exceptions included)."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native tier unavailable")
    import pandas as pd

    from chromosight_tpu.io.cool import CoolFile, create_cool
    from chromosight_tpu.ops.band import band_counts_finalize_u4

    monkeypatch.setenv("CHROMOSIGHT_TPU_U4_HEAD", "4")
    rng = np.random.default_rng(13)
    n, width = 48, 16
    b1 = np.sort(rng.integers(0, n, 400)).astype(np.int64)
    b2 = np.minimum(b1 + rng.integers(0, width, 400), n - 1).astype(np.int64)
    # head columns large-ish, tail columns mostly nibble-sized
    d = b2 - b1
    ct = np.where(d < 4, rng.integers(1, 240, 400), rng.integers(1, 14, 400))
    ct = ct.astype(np.int64)
    ct[::29] = 999  # head AND tail exceptions
    pix = pd.DataFrame({"bin1_id": b1, "bin2_id": b2, "count": ct})
    pix = pix.groupby(["bin1_id", "bin2_id"], as_index=False)["count"].sum()
    bins = pd.DataFrame(
        {
            "chrom": ["c1"] * n,
            "start": np.arange(n) * 1000,
            "end": (np.arange(n) + 1) * 1000,
        }
    )
    path = str(tmp_path / "u4.cool")
    create_cool(path, bins, pix)
    cf = CoolFile(path)
    pack = cf.band_upper_counts_auto((0, n), width, n_rows=n)
    assert pack is not None and pack[0] == "u4"
    _, head, tail, exc_idx, exc_val = pack
    assert len(exc_idx) > 0
    dense = cf.band_upper((0, n), width, n_rows=n)
    cap = 512
    idx_up = np.full(cap, n * width, np.int32)
    val_up = np.zeros(cap, np.float32)
    idx_up[: len(exc_idx)] = exc_idx
    val_up[: len(exc_idx)] = exc_val
    got = np.asarray(
        band_counts_finalize_u4(head, tail, idx_up, val_up, width, width)
    )
    assert np.array_equal(got, dense)
    # u4 disabled -> u8 pack with identical values
    pack8 = cf.band_upper_counts_auto((0, n), width, n_rows=n, allow_u4=False)
    assert pack8 is not None and pack8[0] == "u8"


def test_count_upload_u4_matches_u8_bitwise(
    example_cool, tmp_path, monkeypatch
):
    """End-to-end create_mat: the u4 split upload must produce a device
    band BITWISE equal to the u8 upload's (same unpacked counts, same
    f32 weight product), for balanced and raw norms."""
    import shutil

    import chromosight_tpu.kernels as ck
    from chromosight_tpu.runtime.genome import HicGenome

    path = str(tmp_path / "example.cool")
    shutil.copy(example_cool, path)
    monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_UPLOAD", "1")
    monkeypatch.setenv("CHROMOSIGHT_TPU_NARROW_MIN_ROWS", "0")
    monkeypatch.setenv("CHROMOSIGHT_TPU_U4_HEAD", "16")

    def build(norm):
        hg = HicGenome(path, kernel_config=dict(ck.loops))
        hg.normalize(norm)
        hg.compute_max_dist()
        hg.make_sub_matrices()
        sub = hg.sub_mats.iloc[0]
        sub.contact_map.create_mat()
        return np.asarray(sub.contact_map.band_dev)

    for norm in ("auto", "raw"):
        monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_U4", "0")
        want = build(norm)
        monkeypatch.setenv("CHROMOSIGHT_TPU_COUNT_U4", "1")
        got = build(norm)
        assert np.array_equal(got, want), norm


def test_band_scatter_counts_b2_int32_parity():
    """Minimal-dtype cool files store bin2_id as int32
    (io/cool.py:create_cool); the native scatters must accept the stored
    dtype directly (no whole-table int64 cast) and produce bands bitwise
    identical to the int64 path across the u16/u8/u4 variants."""
    from chromosight_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(7)
    n, width, d0, s = 64, 32, 8, 5
    e = s + n
    counts_per_row = rng.integers(0, 12, size=n)
    rows = np.repeat(np.arange(n), counts_per_row)
    b2 = s + rows + rng.integers(0, width + 6, size=len(rows))
    order = np.lexsort((b2, rows))
    rows, b2 = rows[order], b2[order]
    ct = rng.integers(1, 400, size=len(rows)).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    base = None
    for b2_dtype in (np.int64, np.int32):
        b2t = b2.astype(b2_dtype)
        r16 = native.band_scatter_counts_indptr(
            indptr, b2t, ct, s, e, width, n_rows=n + 4
        )
        r8 = native.band_scatter_counts_u8_indptr(
            indptr, b2t, ct, s, e, width, n_rows=n + 4
        )
        r4 = native.band_scatter_counts_u4_indptr(
            indptr, b2t, ct, s, e, width, d0, n_rows=n + 4, exc_cap=10**6
        )
        assert r16 is not None and r8 is not None and r4 is not None
        if base is None:
            base = (r16, r8, r4)
            continue
        assert np.array_equal(base[0], r16)
        for a, b in zip(base[1], r8):
            assert np.array_equal(a, b)
        for a, b in zip(base[2], r4):
            assert np.array_equal(a, b)
