"""Coordinate-level golden-output parity against the reference.

``tests/data/golden_*.tsv`` were produced by running the REFERENCE
implementation's own ``cmd_detect`` / ``cmd_quantify`` (reference
``cli/chromosight.py:625-896, 295-496``) on ``data_test/example.cool``
via ``tools/gen_reference_golden.py``.  These tests assert that this
package's CLI reproduces the reference's calls exactly at the coordinate
level (bin1/bin2/kernel/iteration) with fp32-tolerance scores/p-values —
the BASELINE.json north-star ("calls identical to CPU chromosight"),
asserted rather than claimed."""

import pathlib

import numpy as np
import pandas as pd
import pytest

from chromosight_tpu.cli.main import main

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def detect_out(tmp_path_factory, example_cool_session):
    prefix = str(tmp_path_factory.mktemp("golden") / "detect")
    rc = main(["detect", "--no-plotting", example_cool_session, prefix])
    assert rc in (0, None)
    return pd.read_csv(prefix + ".tsv", sep="\t")


@pytest.fixture(scope="module")
def example_cool_session(tmp_path_factory):
    import shutil

    src = pathlib.Path(__file__).parents[1] / "data_test" / "example.cool"
    dst = tmp_path_factory.mktemp("cool") / "example.cool"
    shutil.copy(src, dst)
    return str(dst)


def test_detect_matches_reference_coordinates(detect_out):
    """Every one of the 89 golden loop calls at the exact (bin1, bin2),
    same kernel and iteration, no extras."""
    golden = pd.read_csv(DATA / "golden_detect_loops.tsv", sep="\t")
    ours = detect_out
    assert len(ours) == len(golden) == 89
    key = ["bin1", "bin2", "kernel_id", "iteration"]
    g = golden.sort_values(key).reset_index(drop=True)
    o = ours.sort_values(key).reset_index(drop=True)
    for col in key + ["chrom1", "start1", "end1", "chrom2", "start2", "end2"]:
        assert (g[col] == o[col]).all(), f"column {col} differs"


def test_detect_matches_reference_scores(detect_out):
    """Scores and p-values match the reference's fp64 values within fp32
    tolerance (the tsv prints 10 decimals)."""
    golden = pd.read_csv(DATA / "golden_detect_loops.tsv", sep="\t")
    m = golden.merge(
        detect_out, on=["bin1", "bin2"], suffixes=("_ref", "_tpu")
    )
    assert len(m) == 89
    assert np.abs(m.score_ref - m.score_tpu).max() < 5e-5
    assert np.abs(m.pvalue_ref - m.pvalue_tpu).max() < 1e-6
    assert np.abs(m.qvalue_ref - m.qvalue_tpu).max() < 1e-6


@pytest.mark.parametrize(
    "golden,flags",
    [
        ("golden_detect_loops_iter2", ["--iterations", "2"]),
        ("golden_detect_loops_win21", ["--win-size", "21"]),
        ("golden_detect_loops_smooth", ["--smooth-trend"]),
        ("golden_detect_loops_inter", ["--inter"]),
        ("golden_detect_borders", ["--pattern", "borders"]),
        ("golden_detect_loops_small", ["--pattern", "loops_small"]),
        ("golden_detect_hairpins", ["--pattern", "hairpins"]),
        ("golden_detect_stripes_left", ["--pattern", "stripes_left"]),
        ("golden_detect_stripes_right", ["--pattern", "stripes_right"]),
        ("golden_detect_loops_tsvd", ["--tsvd"]),
        ("golden_detect_loops_raw", ["--norm", "raw"]),
        ("golden_detect_loops_maxdist", ["--max-dist", "100000"]),
        ("golden_detect_loops_mindist", ["--min-dist", "40000"]),
        ("golden_detect_loops_perczero", ["--perc-zero", "5"]),
        ("golden_detect_loops_percundetected", ["--perc-undetected", "20"]),
    ],
    ids=[
        "iterations2", "win_size21", "smooth_trend", "inter", "borders",
        "loops_small", "hairpins", "stripes_left", "stripes_right",
        "tsvd", "raw_norm",
        "max_dist", "min_dist", "perc_zero", "perc_undetected",
    ],
)
def test_detect_flag_configs_match_reference(
    tmp_path, example_cool_session, golden, flags
):
    """Previously-untested CLI paths (iterative pileup refinement,
    detect-time kernel resize, isotonic trend smoothing, inter-chromosomal
    scan, multi-kernel diagonal patterns) against reference-generated
    goldens: exact (bin1, bin2, kernel, iteration) coordinates and
    fp32-tolerance scores."""
    g = pd.read_csv(DATA / f"{golden}.tsv", sep="\t")
    prefix = str(tmp_path / "out")
    rc = main(
        ["detect", "--no-plotting", *flags, example_cool_session, prefix]
    )
    assert rc in (0, None)
    o = pd.read_csv(prefix + ".tsv", sep="\t")
    key = ["bin1", "bin2", "kernel_id", "iteration"]
    assert len(o) == len(g)
    assert set(map(tuple, o[key].values)) == set(map(tuple, g[key].values))
    m = g.merge(o, on=key, suffixes=("_ref", "_tpu"))
    assert len(m) == len(g)
    assert np.abs(m.score_ref - m.score_tpu).max() < 5e-5
    assert np.abs(m.pvalue_ref - m.pvalue_tpu).max() < 1e-5
    if golden == "golden_detect_loops_iter2":
        # the pileup-refined second iteration must actually run and add
        # its own calls (reference finds 12 extra patterns at iteration 1)
        assert (o.iteration == 1).sum() > 0


def test_quantify_matches_reference(tmp_path, example_cool_session):
    golden = pd.read_csv(DATA / "golden_quantify_loops.tsv", sep="\t")
    bed2 = str(pathlib.Path(__file__).parents[1] / "data_test" / "example.bed2")
    prefix = str(tmp_path / "quant")
    rc = main(
        ["quantify", "--no-plotting", bed2, example_cool_session, prefix]
    )
    assert rc in (0, None)
    ours = pd.read_csv(prefix + ".tsv", sep="\t")
    assert len(ours) == len(golden) == 53
    m = golden.merge(ours, on=["bin1", "bin2"], suffixes=("_ref", "_tpu"))
    assert len(m) == 53
    # same validation outcome per coordinate (NaN = rejected window)
    assert (m.score_ref.isna() == m.score_tpu.isna()).all()
    ok = m.score_ref.notna()
    assert np.abs(m.score_ref[ok] - m.score_tpu[ok]).max() < 5e-5
    okp = m.pvalue_ref.notna()
    assert (m.pvalue_ref.isna() == m.pvalue_tpu.isna()).all()
    assert np.abs(m.pvalue_ref[okp] - m.pvalue_tpu[okp]).max() < 1e-6
    # reference propagates NaN into every qvalue when any pvalue is NaN
    assert golden.qvalue.isna().all() and ours.qvalue.isna().all()


def test_quantify_borders_matches_reference(tmp_path, example_cool_session):
    """Multi-kernel quantify (borders ships 3 kernels; the fused
    single-dispatch path is the default): the reference keeps the best
    score per coordinate across kernels (ref cli/chromosight.py:431-439)
    — coordinates, validation outcomes and scores must match."""
    golden = pd.read_csv(DATA / "golden_quantify_borders.tsv", sep="\t")
    bed2 = str(pathlib.Path(__file__).parents[1] / "data_test" / "example.bed2")
    prefix = str(tmp_path / "quantb")
    rc = main(
        [
            "quantify", "--no-plotting", "--pattern", "borders",
            bed2, example_cool_session, prefix,
        ]
    )
    assert rc in (0, None)
    ours = pd.read_csv(prefix + ".tsv", sep="\t")
    assert len(ours) == len(golden)
    m = golden.merge(ours, on=["bin1", "bin2"], suffixes=("_ref", "_tpu"))
    assert len(m) == len(golden)
    assert (m.score_ref.isna() == m.score_tpu.isna()).all()
    ok = m.score_ref.notna()
    assert np.abs(m.score_ref[ok] - m.score_tpu[ok]).max() < 5e-5
    okp = m.pvalue_ref.notna() & m.pvalue_tpu.notna()
    assert (m.pvalue_ref.isna() == m.pvalue_tpu.isna()).all()
    # borders' weak correlations (pearson .15) sit where the Fisher
    # transform amplifies f32-vs-f64 rounding; observed max 1.7e-5
    assert np.abs(m.pvalue_ref[okp] - m.pvalue_tpu[okp]).max() < 5e-5


def test_detect_inter_sparse_path_matches_reference(
    tmp_path, example_cool_session, monkeypatch
):
    """Forcing the sparse-resident inter path (ContactMap keeps trans maps
    as CSR and the detector scans them through the halo-tiled engine, as
    at genome scale where densifying a trans pair is infeasible) must
    reproduce the reference --inter golden exactly."""
    monkeypatch.setenv("CHROMOSIGHT_TPU_DENSE_LIMIT", "50")
    g = pd.read_csv(DATA / "golden_detect_loops_inter.tsv", sep="\t")
    prefix = str(tmp_path / "out")
    rc = main(
        ["detect", "--no-plotting", "--inter", example_cool_session, prefix]
    )
    assert rc in (0, None)
    o = pd.read_csv(prefix + ".tsv", sep="\t")
    key = ["bin1", "bin2", "kernel_id", "iteration"]
    assert len(o) == len(g)
    assert set(map(tuple, o[key].values)) == set(map(tuple, g[key].values))
    m = g.merge(o, on=key, suffixes=("_ref", "_tpu"))
    assert np.abs(m.score_ref - m.score_tpu).max() < 5e-5
    assert np.abs(m.pvalue_ref - m.pvalue_tpu).max() < 1e-5


def test_quantify_inter_sparse_path_matches_dense(
    tmp_path, example_cool_session, monkeypatch
):
    """Quantify with trans (inter-chromosomal) coordinate pairs through
    the sparse-resident inter path must score identically to the dense
    path (NaN validation outcomes included)."""
    bed = tmp_path / "pairs.bed2"
    bed.write_text(
        "chr1\t63000\t64000\tchr1\t74000\t75000\n"
        "chr1\t50000\t51000\tchr2\t80000\t81000\n"
        "chr1\t100000\t101000\tchr2\t200000\t201000\n"
        "chr2\t130000\t131000\tchr3\t139000\t140000\n"
    )

    def run(prefix):
        rc = main(
            [
                "quantify", "--no-plotting", "--inter",
                str(bed), example_cool_session, prefix,
            ]
        )
        assert rc in (0, None)
        return pd.read_csv(prefix + ".tsv", sep="\t")

    dense = run(str(tmp_path / "dense"))
    monkeypatch.setenv("CHROMOSIGHT_TPU_DENSE_LIMIT", "50")
    monkeypatch.setenv("CHROMOSIGHT_TPU_TILE", "128")
    sparse = run(str(tmp_path / "sparse"))
    assert len(dense) == len(sparse) == 4
    for col in ["chrom1", "start1", "chrom2", "start2", "bin1", "bin2"]:
        assert (dense[col].fillna(-1) == sparse[col].fillna(-1)).all()
    assert np.array_equal(np.isnan(dense.score), np.isnan(sparse.score))
    ok = ~np.isnan(dense.score)
    assert np.allclose(dense.score[ok], sparse.score[ok], atol=5e-5)


def test_detect_inter_sparse_dump(tmp_path, example_cool_session, monkeypatch):
    """--dump through the sparse inter path writes the stage snapshots."""
    monkeypatch.setenv("CHROMOSIGHT_TPU_DENSE_LIMIT", "50")
    dumpdir = tmp_path / "dumps"
    dumpdir.mkdir()
    rc = main(
        [
            "detect", "--no-plotting", "--inter", "--dump", str(dumpdir),
            example_cool_session, str(tmp_path / "out"),
        ]
    )
    assert rc in (0, None)
    names = {p.name for p in dumpdir.iterdir()}
    # trans pairs dump the correlation stage through the sparse detector
    assert any("chr1-chr2" in n and "03_normxcorr2" in n for n in names), names
