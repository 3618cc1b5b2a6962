"""CLI integration tests: drive real subcommands end-to-end on the example
fixture (mirrors reference tests/test_chromosight.py), including the golden
89-pattern loop detection result."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
# Full CLI / end-to-end runs: minutes on one core. `pytest -m "not slow"` is the fast tier.
pytestmark = pytest.mark.slow


from chromosight_tpu.cli.main import main


@pytest.fixture()
def workdir(tmp_path, example_cool, example_bed2):
    cool = str(tmp_path / "example.cool")
    bed2 = str(tmp_path / "example.bed2")
    shutil.copy(example_cool, cool)
    shutil.copy(example_bed2, bed2)
    return tmp_path, cool, bed2


def test_detect_golden_89_loops(workdir):
    """The headline regression test: loop detection on the example dataset
    must find exactly 89 patterns (reference golden log,
    cli/chromosight.py:185-199)."""
    tmp, cool, _ = workdir
    prefix = str(tmp / "out")
    assert main(["detect", "--no-plotting", cool, prefix]) == 0
    table = pd.read_csv(prefix + ".tsv", sep="\t")
    assert table.shape[0] == 89
    assert list(table.columns) == [
        "chrom1", "start1", "end1", "chrom2", "start2", "end2",
        "bin1", "bin2", "kernel_id", "iteration", "score", "pvalue", "qvalue",
    ]
    assert (table.score >= 0.3).all()
    assert ((table.start2 - table.start1).abs() >= 20000).all()
    with open(prefix + ".json") as fh:
        wins = json.load(fh)
    assert len(wins) == 89
    assert np.array(wins["0"]).shape == (17, 17)


def test_detect_norm_raw(workdir):
    tmp, cool, _ = workdir
    prefix = str(tmp / "raw")
    assert main(["detect", "--no-plotting", "--norm", "raw", cool, prefix]) == 0
    table = pd.read_csv(prefix + ".tsv", sep="\t")
    assert table.shape[0] > 0


def test_detect_with_dump(workdir):
    tmp, cool, _ = workdir
    prefix = str(tmp / "dumped")
    dump_dir = str(tmp / "dumps")
    assert (
        main(["detect", "--no-plotting", "-d", dump_dir, cool, prefix]) == 0
    )
    dumps = os.listdir(dump_dir)
    assert any("01_detrended" in d for d in dumps)
    assert any("02_remove_diags" in d for d in dumps)
    assert any("03_normxcorr2" in d for d in dumps)
    assert any("04_diag_trim" in d for d in dumps)
    assert any("05_foci" in d for d in dumps)


def test_detect_tsvd(workdir):
    tmp, cool, _ = workdir
    prefix = str(tmp / "tsvd")
    assert main(["detect", "--no-plotting", "--tsvd", cool, prefix]) == 0
    table = pd.read_csv(prefix + ".tsv", sep="\t")
    # tSVD is approximate: expect nearly the same number of detections
    assert abs(table.shape[0] - 89) <= 5


def test_detect_win_npy_and_subsample(workdir):
    tmp, cool, _ = workdir
    prefix = str(tmp / "sub")
    np.random.seed(0)
    assert (
        main(
            [
                "detect", "--no-plotting", "--win-fmt", "npy",
                "--subsample", "0.8", cool, prefix,
            ]
        )
        == 0
    )
    wins = np.load(prefix + ".npy")
    assert wins.ndim == 3


@pytest.mark.parametrize("pattern", ["borders", "hairpins"])
def test_detect_diagonal_patterns(workdir, pattern):
    tmp, cool, _ = workdir
    prefix = str(tmp / pattern)
    assert (
        main(["detect", "--no-plotting", "-P", pattern, cool, prefix]) == 0
    )
    table = pd.read_csv(prefix + ".tsv", sep="\t")
    # diagonal patterns are reported on the diagonal
    assert (table.bin1 == table.bin2).all()


def test_detect_centromeres_no_patterns(workdir, capsys):
    """centromeres (81x81 kernel, pearson .5) finds nothing on the yeast
    fixture; the reference prints "No pattern detected ! Exiting." and
    exits 0 without writing a tsv (cli/chromosight.py:795-797 — outcome
    verified by running the reference's own cmd_detect on this fixture)."""
    tmp, cool, _ = workdir
    prefix = str(tmp / "cen")
    with pytest.raises(SystemExit) as exc:
        main(["detect", "--no-plotting", "-P", "centromeres", cool, prefix])
    assert exc.value.code == 0
    assert "No pattern detected ! Exiting." in capsys.readouterr().err
    assert not os.path.exists(prefix + ".tsv")


def test_quantify(workdir):
    tmp, cool, bed2 = workdir
    prefix = str(tmp / "quant")
    assert main(["quantify", "--no-plotting", bed2, cool, prefix]) == 0
    table = pd.read_csv(prefix + ".tsv", sep="\t")
    assert table.shape[0] == 53
    assert "score" in table.columns and "qvalue" in table.columns
    assert table.score.notna().sum() > 20


def test_generate_config_preset(workdir):
    tmp, cool, _ = workdir
    prefix = str(tmp / "cfg")
    assert main(["generate-config", "--preset", "borders", prefix]) == 0
    with open(prefix + ".json") as fh:
        cfg = json.load(fh)
    assert cfg["name"] == "borders"
    assert len(cfg["kernels"]) == 3
    k = np.loadtxt(prefix + ".1.txt")
    assert k.shape == (17, 17)
    # Generated config is loadable as a custom config
    import chromosight_tpu.io as cio

    loaded = cio.load_kernel_config(prefix + ".json", custom=True)
    assert loaded["kernels"][0].shape == (17, 17)


def test_generate_config_win_size(workdir):
    tmp, cool, _ = workdir
    prefix = str(tmp / "cfg9")
    assert (
        main(["generate-config", "--preset", "loops", "-W", "9", prefix]) == 0
    )
    k = np.loadtxt(prefix + ".1.txt")
    assert k.shape == (9, 9)


def test_list_kernels(capsys):
    assert main(["list-kernels"]) == 0
    out = capsys.readouterr().out
    for name in ["loops", "borders", "hairpins", "centromeres"]:
        assert name in out
    assert main(["list-kernels", "--long", "--name", "loops"]) == 0
    out = capsys.readouterr().out
    assert "pearson" in out


def test_cli_test_subcommand_golden_log(workdir, monkeypatch, capsys):
    """`chromosight test` must reproduce the golden log exactly."""
    tmp, cool, _ = workdir
    monkeypatch.chdir(tmp)
    monkeypatch.setenv("CHROMOSIGHT_TPU_TEST_COOL", cool)
    # Reload module-level constant
    import chromosight_tpu.cli.main as m

    monkeypatch.setattr(m, "LOCAL_EXAMPLE_DATASET", cool)
    assert main(["test"]) == 0
    err = capsys.readouterr().err
    assert "89 patterns detected" in err
    assert "Warning, the test log differed" not in err


def test_version(capsys):
    assert main(["--version"]) == 0
    out = capsys.readouterr().out
    assert "version" in out


def test_detect_worker_pipeline_byte_parity(workdir, monkeypatch):
    """Pipelined per-chromosome detect workers
    (CHROMOSIGHT_TPU_DETECT_PIPELINE, cli/main.py _Prefetcher.map) must
    produce byte-identical output to the serial worker loop: per-map
    results are independent, so overlapping the dispatch->fence chains
    of consecutive chromosomes may never change a call."""
    tmp, cool, _ = workdir
    outs = {}
    for depth in ("1", "3"):
        monkeypatch.setenv("CHROMOSIGHT_TPU_DETECT_PIPELINE", depth)
        prefix = str(tmp / f"pipe{depth}")
        assert main(["detect", "--no-plotting", cool, prefix]) == 0
        outs[depth] = (tmp / f"pipe{depth}.tsv").read_bytes()
    assert outs["1"] == outs["3"]


def test_detect_skips_chromosomes_smaller_than_kernel(tmp_path):
    """Chromosomes smaller than the kernel are skipped gracefully
    (reference detection.py:236-238) and detection proceeds on the rest."""
    import pandas as pd

    from chromosight_tpu.io.cool import create_cool
    from chromosight_tpu.ops.balance import ice_balance
    from chromosight_tpu.io.cool import CoolFile

    rng = np.random.RandomState(0)
    # one tiny chromosome (8 bins) + one normal one (160 bins)
    frames = []
    pixels = []
    offset = 0
    for name, n in [("tiny", 8), ("chrA", 160)]:
        frames.append(
            pd.DataFrame(
                {
                    "chrom": [name] * n,
                    "start": np.arange(n) * 1000,
                    "end": (np.arange(n) + 1) * 1000,
                }
            )
        )
        r, c = np.triu_indices(n)
        keep = (c - r) < 60
        pixels.append(
            pd.DataFrame(
                {
                    "bin1_id": r[keep] + offset,
                    "bin2_id": c[keep] + offset,
                    "count": rng.poisson(20, size=keep.sum()) + 1,
                }
            )
        )
        offset += n
    path = str(tmp_path / "mixed.cool")
    create_cool(path, pd.concat(frames, ignore_index=True),
                pd.concat(pixels, ignore_index=True))
    ice_balance(CoolFile(path), cis_only=True, store=True)
    prefix = str(tmp_path / "out")
    # The 17x17 loops kernel exceeds the 8-bin chromosome, which must be
    # skipped; random data may yield no detections anywhere, in which case
    # the CLI exits 0 with "No pattern detected" (reference cli:795-797).
    try:
        rc = main(["detect", "--no-plotting", "-P", "loops_small",
                   path, prefix])
        assert rc in (0, None)
        assert os.path.exists(prefix + ".tsv")
    except SystemExit as exc:
        assert exc.code == 0
