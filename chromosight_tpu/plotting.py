"""Plot utilities: pileup images, whole-matrix overlays, interactive kernel
capture, and ASCII-art rendering of kernel matrices.

Mirrors the reference ``chromosight/utils/plotting.py``.  matplotlib is
imported lazily so headless compute environments without it can still use
the detection pipeline.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _plt():
    import matplotlib

    if not os.environ.get("DISPLAY"):
        matplotlib.use("Agg", force=False)
    from matplotlib import pyplot as plt

    return plt


def pileup_plot(pileup_pattern, output_prefix, name="pileup_patterns"):
    """Save a pileup heatmap as ``<prefix>.pdf`` (reference plotting.py:11-28)."""
    plt = _plt()
    plt.imshow(
        pileup_pattern,
        interpolation="none",
        vmin=0.0,
        vmax=2.0,
        cmap="seismic",
    )
    plt.title("{} pileup".format(name))
    plt.colorbar()
    plt.xlabel(output_prefix)
    plt.savefig(output_prefix + ".pdf", dpi=100, format="pdf")
    plt.close("all")


def plot_whole_matrix(
    clr, patterns, out=None, region=None, region2=None, log_transform=False
):
    """Overlay detected patterns on the contact matrix
    (reference plotting.py:31-97).  ``clr`` is a CoolFile; ``region`` and
    ``region2`` are chromosome names."""
    plt = _plt()
    if region is not None:
        s1, e1 = clr.extent(region)
        if region2 is not None:
            s2, e2 = clr.extent(region2)
        else:
            s2, e2 = s1, e1
    else:
        s1, e1 = 0, clr.shape[0]
        s2, e2 = 0, clr.shape[1]
    rows, cols, vals = clr.pixels_coo((s1, e1), (s2, e2), balance=True)
    mat = np.zeros((e1 - s1, e2 - s2))
    mat[rows, cols] = vals

    pat = patterns.copy()
    pat = pat.loc[
        (pat.bin1 > s1) & (pat.bin1 < e1) & (pat.bin2 > s2) & (pat.bin2 < e2),
        :,
    ]
    if log_transform:
        mat = np.log(mat)
    mat[mat == 0] = np.nan
    plt.figure(dpi=1200)
    plt.imshow(mat, cmap="Reds", vmax=np.percentile(mat[~np.isnan(mat)], 99))
    plt.scatter(
        pat.bin1 - s1,
        pat.bin2 - s2,
        facecolors="none",
        edgecolors="blue",
        s=0.05,
    )
    if out is None:
        plt.show()
    else:
        plt.savefig(out)


def click_finder(mat, half_w=8, xlab=None, ylab=None):
    """Record double-clicked windows on an interactive matrix view
    (reference plotting.py:100-175)."""
    plt = _plt()
    import scipy.sparse as sp

    dense = np.asarray(mat.todense()) if sp.issparse(mat) else np.asarray(mat)
    nz = dense[dense != 0]
    clicks = []

    def onclick(event):
        if event.xdata is None or event.ydata is None:
            return None
        ix, iy = int(event.xdata), int(event.ydata)
        if clicks and clicks[-1] == (ix, iy):
            print(f"x = {ix}, y = {iy}")
        clicks.append((ix, iy))
        return clicks

    fig = plt.figure()
    plt.imshow(dense, cmap="afmhot_r", vmax=np.percentile(nz, 95))
    plt.title("Double click to record pattern positions")
    if xlab:
        plt.xlabel(xlab)
    if ylab:
        plt.ylabel(ylab)
    cid = fig.canvas.mpl_connect("button_press_event", onclick)
    plt.show()
    fig.canvas.mpl_disconnect(cid)
    # Keep positions clicked twice in a row (double clicks)
    double_clicked = set()
    for c in range(1, len(clicks)):
        if clicks[c - 1] == clicks[c]:
            double_clicked.add(clicks[c])
    img_stack = np.zeros((len(double_clicked), half_w * 2 + 1, half_w * 2 + 1))
    bad = np.zeros(len(double_clicked), dtype=bool)
    for i, (center_v, center_h) in enumerate(double_clicked):
        top, bottom = center_h - half_w, center_h + half_w + 1
        left, right = center_v - half_w, center_v + half_w + 1
        win = dense[max(top, 0) : bottom, max(left, 0) : right]
        if win.shape != img_stack.shape[1:] or top < 0 or left < 0:
            bad[i] = True
            sys.stderr.write(
                f"Discarding {(center_v, center_h)}: Too close "
                "to the edge of the matrix\n"
            )
        else:
            img_stack[i] = win
    return img_stack[~bad]


def print_ascii_mat(mat, adjust=True, colored=False, print_str=True):
    """Percentile-quantised ASCII art of a matrix
    (reference plotting.py:178-249)."""
    if adjust:
        try:
            term_width = (os.get_terminal_size()[0] // 2) - 5
        except OSError:
            term_width = 79
        step = int(max(1, np.ceil(mat.shape[1] / term_width)))
    else:
        step = 1
    glyphs = " .,:;ox%#@"
    palette = [
        "\x1b[37m",
        "\x1b[37m",
        "\x1b[36m",
        "\x1b[36m",
        "\x1b[32m",
        "\x1b[32m",
        "\x1b[34m",
        "\x1b[34m",
        "\x1b[33m",
        "\x1b[31m",
    ]
    suffix = "\x1b[0m" if colored else ""

    out_parts = []

    def emit(text, end="\n"):
        if print_str:
            print(text, end=end)
        else:
            out_parts.append(text + end)

    sorted_pixels = np.sort(mat.flatten())
    perc = np.searchsorted(sorted_pixels, mat) / len(sorted_pixels)
    perc = (10 * perc).astype(int)
    emit("  " + "- " * (1 + perc.shape[1] // step))
    for i in range(0, mat.shape[0], step):
        emit("  |", end="")
        for j in range(0, mat.shape[1], step):
            pix = perc[i, j]
            prefix = palette[pix] if colored else ""
            emit(f"{prefix}{glyphs[pix]}{suffix} ", end="")
        emit("|")
    emit("  " + "- " * (1 + perc.shape[1] // step))
    return "".join(out_parts)
