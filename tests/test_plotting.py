"""Plotting smoke tests (Agg backend) mirroring reference
tests/test_plotting.py."""

import numpy as np
import matplotlib

matplotlib.use("Agg")

import chromosight_tpu.plotting as cup


def test_pileup_plot(tmp_path):
    pileup = np.random.rand(17, 17)
    prefix = str(tmp_path / "pileup")
    cup.pileup_plot(pileup, prefix, name="test")
    assert (tmp_path / "pileup.pdf").exists()


def test_print_ascii_mat(capsys):
    mat = np.random.rand(10, 10)
    cup.print_ascii_mat(mat)
    out = capsys.readouterr().out
    assert "|" in out and "-" in out


def test_print_ascii_mat_string():
    mat = np.random.rand(5, 5)
    art = cup.print_ascii_mat(mat, print_str=False, colored=True)
    assert isinstance(art, str)
    assert "\x1b[" in art


def test_plot_whole_matrix(tmp_path, example_cool):
    import pandas as pd

    from chromosight_tpu.io.cool import CoolFile

    clr = CoolFile(example_cool)
    patterns = pd.DataFrame(
        {"bin1": [10, 50], "bin2": [40, 90], "score": [0.5, 0.6]}
    )
    out = str(tmp_path / "overlay.png")
    cup.plot_whole_matrix(clr, patterns, out=out, region="chr1")
    assert (tmp_path / "overlay.png").exists()
