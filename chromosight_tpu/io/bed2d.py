"""2D BED parsing (pairs of genomic intervals), reference utils/io.py:284-327."""

from __future__ import annotations

import csv

import pandas as pd


def load_bed2d(path):
    """Load the first 6 columns of a 2D BED file, sniffing for a header.

    For intrachromosomal pairs, anchors are swapped so start1 <= start2,
    matching the reference behaviour (utils/io.py:314-326).
    """
    sniffer = csv.Sniffer()
    with open(path) as handle:
        has_header = sniffer.has_header(handle.read(65536))
    if has_header:
        bed2d = pd.read_csv(path, sep="\t", header=0, usecols=range(6))
    else:
        bed2d = pd.read_csv(
            path,
            sep="\t",
            header=None,
            names=["chrom1", "start1", "end1", "chrom2", "start2", "end2"],
            usecols=range(6),
        )
    bed2d["chrom1"] = bed2d["chrom1"].astype(str)
    bed2d["chrom2"] = bed2d["chrom2"].astype(str)
    flipped = (bed2d["start2"] < bed2d["start1"]) & (
        bed2d["chrom1"] == bed2d["chrom2"]
    )
    for col in ("start", "end"):
        a = bed2d[f"{col}1"].copy()
        b = bed2d[f"{col}2"].copy()
        bed2d.loc[flipped, f"{col}1"] = b[flipped]
        bed2d.loc[flipped, f"{col}2"] = a[flipped]
    return bed2d
