"""Output writers for pattern tables and window stacks.

Output formats are byte-compatible with the reference
(utils/io.py:208-256): a tab-separated table with 10-decimal floats, and
window stacks as JSON dict-of-2D-lists or .npy.
"""

from __future__ import annotations

import json
import shutil
from os.path import dirname, isdir
from urllib.request import urlopen

import numpy as np


def write_patterns(coords, output_prefix, dec=10):
    """Write a pattern table to ``<prefix>.tsv`` with ``dec``-decimal floats."""
    file_path = output_prefix + ".tsv"
    coords.to_csv(file_path, sep="\t", index=None, float_format=f"%.{dec}f")


def save_windows(windows, output_prefix, fmt="json"):
    """Save the 3D stack of windows around detected patterns."""
    if fmt == "npy":
        np.save(output_prefix + ".npy", windows)
    elif fmt == "json":
        json_wins = {idx: win.tolist() for idx, win in enumerate(windows)}
        with open(output_prefix + ".json", "w") as handle:
            json.dump(json_wins, handle, indent=4)
    else:
        raise ValueError("window format must be either npy or json.")


def download_file(url, file, length=16 * 1024):
    req = urlopen(url)
    with open(file, "wb") as fp:
        shutil.copyfileobj(req, fp, length)


def check_prefix_dir(prefix):
    """Raise if the parent directory of an output prefix does not exist."""
    out_dir = dirname(prefix)
    if out_dir and not isdir(out_dir):
        raise OSError(f"Directory {out_dir} does not exist.")
