#!/usr/bin/env python3
"""Pattern exploration and detection (TPU-native).

Explore and detect patterns (loops, borders, centromeres, etc.) in Hi-C
contact maps with pattern matching, using a JAX/XLA compute core.

Usage:
    chromosight detect  [--kernel-config=FILE] [--pattern=loops]
                        [--pearson=auto] [--win-size=auto] [--iterations=auto]
                        [--win-fmt={json,npy}] [--norm={auto,raw,force}]
                        [--subsample=no] [--inter] [--tsvd] [--smooth-trend]
                        [--n-mads=5] [--min-dist=0] [--max-dist=auto]
                        [--no-plotting] [--min-separation=auto] [--dump=DIR]
                        [--threads=1] [--perc-zero=auto]
                        [--perc-undetected=auto] <contact_map> <prefix>
    chromosight generate-config [--preset loops] [--click contact_map]
                        [--norm={auto,raw,norm}] [--win-size=auto] [--n-mads=5]
                        [--chroms=CHROMS] [--inter] [--threads=1] <prefix>
    chromosight quantify [--inter] [--pattern=loops] [--subsample=no]
                         [--win-fmt=json] [--kernel-config=FILE] [--norm={auto,raw,norm}]
                         [--threads=1] [--n-mads=5] [--win-size=auto]
                         [--perc-undetected=auto] [--perc-zero=auto]
                         [--no-plotting] [--tsvd] <bed2d> <contact_map> <prefix>
    chromosight list-kernels [--long] [--mat] [--name=kernel_name]
    chromosight test

Grammar, options and output formats are compatible with the reference CLI
(see the reference implementation's help text for full option docs,
``cli/chromosight.py:8-151``).
"""

from __future__ import annotations

import io
import itertools as it
import json
import os
import pathlib
import sys
import tempfile
from contextlib import contextmanager

import numpy as np
import pandas as pd

import chromosight_tpu.detection as cid
import chromosight_tpu.io as cio
import chromosight_tpu.kernels as ck
from chromosight_tpu.cli.args import CliError, parse_args
from chromosight_tpu.preprocessing import resize_kernel
from chromosight_tpu.runtime import HicGenome
from chromosight_tpu.stats import fdr_correction
from chromosight_tpu.version import __version__
from chromosight_tpu.config import init_compilation_cache

init_compilation_cache()

LOGO = np.loadtxt(pathlib.Path(__file__).parents[0] / "logo.txt")
URL_EXAMPLE_DATASET = (
    "https://raw.githubusercontent.com/koszullab/"
    "chromosight/master/data_test/example.cool"
)
# Offline fallback for the test subcommand: a re-encoded copy of the example
# dataset shipped with the repository (overridable via environment).
LOCAL_EXAMPLE_DATASET = os.environ.get(
    "CHROMOSIGHT_TPU_TEST_COOL",
    str(pathlib.Path(__file__).parents[2] / "data_test" / "example.cool"),
)

# Golden log of the self-test (identical to the reference's TEST_LOG,
# cli/chromosight.py:185-199: the detection results must match exactly).
TEST_LOG = f"""Fetching test dataset at {URL_EXAMPLE_DATASET}...
Running detection on test dataset...
pearson set to 0.3 based on config file.
max_dist set to 2000000 based on config file.
min_dist set to 20000 based on config file.
min_separation set to 5000 based on config file.
max_perc_undetected set to 50.0 based on config file.
max_perc_zero set to 10.0 based on config file.
Matrix already balanced, reusing weights
Preprocessing sub-matrices...
Detecting patterns...
89 patterns detected
Saving patterns in chromosight_test.tsv
Saving patterns in chromosight_test.json
"""


def _override_kernel_config(param_name, param_value, param_type, config):
    """Resolve an "auto" CLI value from the kernel config, or override it.

    Reference: ``cli/chromosight.py:202-226``.
    """
    if param_value == "auto":
        try:
            sys.stderr.write(
                f"{param_name} set to {config[param_name]} based on config file.\n"
            )
        except KeyError:
            raise KeyError(
                f"{param_name} is not defined in the config. Please add it to "
                f"the JSON config file, or provide it as a command line option."
            )
    else:
        try:
            config[param_name] = param_type(param_value)
        except ValueError:
            raise ValueError(
                f'Error: {param_name} must be a {param_type} or "auto"'
            )
    return config


class _Prefetcher:
    """Pipelines ContactMap.create_mat of the next work item on a worker
    thread while the main thread detects on the current one.  h5py reads
    and device uploads release the GIL, so IO genuinely overlaps compute
    even on a single core."""

    def __init__(self, items, threads):
        self.items = items
        self.threads = threads

    @staticmethod
    def _create(data):
        cm = data[0][1].contact_map
        if cm.band_dev is None and cm.dense is None:
            cm.create_mat()

    def map(self, fn):
        if self.threads <= 1 or len(self.items) <= 1:
            for data in self.items:
                yield fn(data)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self._create, self.items[0])
            for idx, data in enumerate(self.items):
                fut.result()
                if idx + 1 < len(self.items):
                    fut = pool.submit(self._create, self.items[idx + 1])
                yield fn(data)


def _detect_sub_mat(data):
    """Per-submatrix detection task (reference cli/chromosight.py:601-622)."""
    from chromosight_tpu.observability import stage

    sub = data[0][1]
    config = data[1]
    kernel = data[2]
    dump = data[3]
    with stage("load+preprocess"):
        if sub.contact_map.band_dev is None and sub.contact_map.dense is None:
            sub.contact_map.create_mat()
    with stage("detect"):
        chrom_patterns, chrom_windows = cid.pattern_detector(
            sub.contact_map,
            config,
            kernel,
            dump=dump,
            full=True,
            tsvd=config["tsvd"],
        )
    sub.contact_map.destroy_mat()
    return {
        "coords": chrom_patterns,
        "windows": chrom_windows,
        "chr1": sub.chr1,
        "chr2": sub.chr2,
    }


def _quantify_sub_mat(data):
    """Per-submatrix quantification task (reference cli:229-260)."""
    sub = data[0][1]
    config = data[1]
    kernel = data[2]
    positions = data[3]
    if positions.shape[0]:
        if (
            sub.contact_map.band_dev is None
            and sub.contact_map.dense is None
        ):
            sub.contact_map.create_mat()
        patterns, windows = cid.pattern_detector(
            sub.contact_map,
            config,
            kernel,
            coords=np.array(positions.loc[:, ["bin1", "bin2"]]),
            full=True,
            tsvd=config["tsvd"],
        )
        sub.contact_map.destroy_mat()
    else:
        patterns = windows = None
    return {
        "coords": patterns,
        "windows": windows,
        "chr1": sub.chr1,
        "chr2": sub.chr2,
    }


def _get_chrom_pos(positions, hic_genome, chr1, chr2):
    """Filter 2D positions for one chrom pair; convert to submatrix bins.

    Reference: ``cli/chromosight.py:263-292``.
    """
    sub_pat = positions.loc[
        (positions.chrom1 == chr1) & (positions.chrom2 == chr2)
    ].copy()
    for ax in [1, 2]:
        sub_pat_ax = sub_pat.loc[:, [f"chrom{ax}", f"pos{ax}"]].rename(
            columns={f"chrom{ax}": "chrom", f"pos{ax}": "pos"}
        )
        sub_pat_bins = hic_genome.coords_to_bins(sub_pat_ax)
        sub_pat[f"bin{ax}"] = sub_pat_bins
    fall_out = np.isnan(sub_pat["bin1"]) | np.isnan(sub_pat["bin2"])
    if np.any(fall_out):
        n_out = int(np.sum(fall_out))
        sys.stderr.write(
            f"\n{n_out} entr{'ies' if n_out > 1 else 'y'} outside "
            "genomic coordinates of the Hi-C matrix will be ignored.\n"
        )
        sub_pat = sub_pat.loc[~fall_out, :]
    sub_pat_idx = sub_pat.index.values
    sub_pat = hic_genome.get_sub_mat_pattern(chr1, chr2, sub_pat)
    return sub_pat_idx, sub_pat


def cmd_detect(args):
    """Full detection pipeline (reference ``cli/chromosight.py:625-896``)."""
    dump = args["--dump"]
    norm = args["--norm"]
    interchrom = args["--inter"]
    iterations = args["--iterations"]
    kernel_config_path = args["--kernel-config"]
    mat_path = args["<contact_map>"]
    max_dist = args["--max-dist"]
    min_dist = args["--min-dist"]
    min_separation = args["--min-separation"]
    n_mads = float(args["--n-mads"])
    prefix = args["<prefix>"]
    pattern = args["--pattern"]
    pearson = args["--pearson"]
    perc_zero = args["--perc-zero"]
    perc_undetected = args["--perc-undetected"]
    subsample = args["--subsample"]
    threads = int(args["--threads"])
    tsvd = 0.999 if args["--tsvd"] else None
    win_fmt = args["--win-fmt"]
    win_size = args["--win-size"]
    if subsample == "no":
        subsample = None
    plotting_enabled = False if args["--no-plotting"] else True
    smooth_trend = bool(args["--smooth-trend"])

    cio.check_prefix_dir(prefix)
    if win_fmt not in ["npy", "json"]:
        sys.stderr.write("Error: --win-fmt must be either json or npy.\n")
        sys.exit(1)
    if kernel_config_path is not None:
        custom = True
        config_path = kernel_config_path
    else:
        custom = False
        config_path = pattern

    params = {
        "max_iterations": (iterations, int),
        "pearson": (pearson, float),
        "max_dist": (max_dist, int),
        "min_dist": (min_dist, int),
        "min_separation": (min_separation, int),
        "max_perc_undetected": (perc_undetected, float),
        "max_perc_zero": (perc_zero, float),
    }
    cfg = cio.load_kernel_config(config_path, custom)
    for param_name, (param_value, param_type) in params.items():
        cfg = _override_kernel_config(param_name, param_value, param_type, cfg)

    if win_size != "auto":
        win_size = int(win_size)
        if not win_size % 2:
            raise ValueError("--win-size must be odd")
        cfg["kernels"] = [
            resize_kernel(k, factor=win_size / k.shape[0])
            for k in cfg["kernels"]
        ]

    if interchrom:
        sys.stderr.write(
            "WARNING: Detection on interchromosomal matrices is expensive in RAM\n"
        )
    hic_genome = HicGenome(
        mat_path,
        inter=interchrom,
        kernel_config=cfg,
        dump=dump,
        smooth=smooth_trend,
        sample=subsample,
    )
    hic_genome.kernel_config = cfg
    hic_genome.normalize(norm=norm, n_mads=n_mads, threads=threads)
    hic_genome.compute_max_dist()
    hic_genome.make_sub_matrices()

    all_coords = []
    all_windows = []

    n_sub_mats = hic_genome.sub_mats.shape[0]
    run_id = 0
    cfg["tsvd"] = tsvd
    total_runs = len(cfg["kernels"]) * cfg["max_iterations"]
    sys.stderr.write("Detecting patterns...\n")
    from chromosight_tpu.observability import maybe_trace

    trace_ctx = maybe_trace()
    trace_ctx.__enter__()
    for kernel_id, kernel_matrix in enumerate(cfg["kernels"]):
        for i in range(cfg["max_iterations"]):
            cio.progress(
                run_id, total_runs, f"Kernel: {kernel_id}, Iteration: {i}\n"
            )
            sub_mat_data = list(
                zip(
                    hic_genome.sub_mats.iterrows(),
                    (cfg for _ in range(n_sub_mats)),
                    (kernel_matrix for _ in range(n_sub_mats)),
                    (dump for _ in range(n_sub_mats)),
                )
            )
            sub_mat_results = []
            # --threads > 1 pipelines the host IO + device upload of the
            # next submatrix behind the detection of the current one (the
            # reference used a process pool here, cli/chromosight.py:748).
            prefetcher = _Prefetcher(sub_mat_data, threads)
            for s, result in enumerate(
                prefetcher.map(_detect_sub_mat)
            ):
                cio.progress(s, n_sub_mats, f"{result['chr1']}-{result['chr2']}")
                sub_mat_results.append(result)

            kernel_coords = [
                hic_genome.get_full_mat_pattern(d["chr1"], d["chr2"], d["coords"])
                for d in sub_mat_results
                if d["coords"] is not None
            ]
            try:
                kernel_windows = np.concatenate(
                    [
                        w["windows"]
                        for w in sub_mat_results
                        if w["windows"] is not None
                    ],
                    axis=0,
                )
                all_coords.append(
                    pd.concat(kernel_coords, axis=0).reset_index(drop=True)
                )
                all_coords[-1]["kernel_id"] = kernel_id
                all_coords[-1]["iteration"] = i
                all_windows.append(kernel_windows)
            except ValueError:
                # No pattern was found with this kernel: skip its iterations
                break
            kernel_matrix = cid.pileup_patterns(kernel_windows)
            run_id += 1
    cio.progress(run_id, total_runs, f"Kernel: {kernel_id}, Iteration: {i}\n")
    if len(all_coords) == 0:
        sys.stderr.write("No pattern detected ! Exiting.\n")
        sys.exit(0)
    all_coords = pd.concat(all_coords, axis=0).reset_index(drop=True)
    all_windows = np.concatenate(all_windows, axis=0)

    separation_bins = int(cfg["min_separation"] // hic_genome.clr.binsize)
    if separation_bins < 1:
        separation_bins = 1
    print(f"Minimum pattern separation is : {separation_bins}")
    distinct_patterns = cid.remove_neighbours(
        all_coords, win_size=separation_bins
    )
    all_coords = all_coords.loc[distinct_patterns, :]
    all_windows = all_windows[distinct_patterns, :, :]

    coords_1 = hic_genome.bins_to_coords(all_coords.bin1).reset_index(drop=True)
    coords_1.columns = [str(col) + "1" for col in coords_1.columns]
    coords_2 = hic_genome.bins_to_coords(all_coords.bin2).reset_index(drop=True)
    coords_2.columns = [str(col) + "2" for col in coords_2.columns]
    all_coords = pd.concat(
        [all_coords.reset_index(drop=True), coords_1, coords_2], axis=1
    )

    min_dist_drop_mask = (all_coords.chrom1 == all_coords.chrom2) & (
        np.abs(all_coords.start2 - all_coords.start1) < cfg["min_dist"]
    )
    all_coords = all_coords.loc[~min_dist_drop_mask, :]
    all_windows = all_windows[~min_dist_drop_mask, :, :]
    del min_dist_drop_mask

    pval_mask = all_coords.pvalue.isnull()
    all_coords = all_coords.loc[~pval_mask, :]
    all_windows = all_windows[~pval_mask, :, :]
    del pval_mask
    all_coords["qvalue"] = fdr_correction(all_coords["pvalue"])
    all_coords = all_coords.loc[
        :,
        [
            "chrom1",
            "start1",
            "end1",
            "chrom2",
            "start2",
            "end2",
            "bin1",
            "bin2",
            "kernel_id",
            "iteration",
            "score",
            "pvalue",
            "qvalue",
        ],
    ]

    sys.stderr.write(f"{all_coords.shape[0]} patterns detected\n")
    sys.stderr.write(f"Saving patterns in {prefix}.tsv\n")
    cio.write_patterns(all_coords, prefix)
    sys.stderr.write(f"Saving patterns in {prefix}.{win_fmt}\n")
    cio.save_windows(all_windows, prefix, fmt=win_fmt)

    if plotting_enabled:
        from chromosight_tpu.plotting import pileup_plot

        pileup_title = ("Pileup of {n} {pattern}").format(
            pattern=cfg["name"], n=all_windows.shape[0]
        )
        windows_pileup = cid.pileup_patterns(all_windows)
        if not cfg["max_dist"]:
            windows_pileup = np.nan_to_num(windows_pileup)
            windows_pileup += np.transpose(windows_pileup) - np.diag(
                np.diag(windows_pileup)
            )
        sys.stderr.write(f"Saving pileup plots in {prefix}.pdf\n")
        pileup_plot(windows_pileup, prefix, name=pileup_title)


def cmd_quantify(args):
    """Score user-supplied coordinates (reference ``cli:295-496``)."""
    bed2d_path = args["<bed2d>"]
    mat_path = args["<contact_map>"]
    prefix = args["<prefix>"]
    n_mads = float(args["--n-mads"])
    pattern = args["--pattern"]
    inter = args["--inter"]
    kernel_config_path = args["--kernel-config"]
    perc_zero = args["--perc-zero"]
    perc_undetected = args["--perc-undetected"]
    plotting_enabled = False if args["--no-plotting"] else True
    threads = int(args["--threads"])
    norm = args["--norm"]
    tsvd = 0.999 if args["--tsvd"] else None
    win_fmt = args["--win-fmt"]
    if win_fmt not in ["npy", "json"]:
        sys.stderr.write("Error: --win-fmt must be either json or npy.\n")
        sys.exit(1)
    win_size = args["--win-size"]
    if win_size != "auto":
        win_size = int(win_size)
    subsample = args["--subsample"]
    cio.check_prefix_dir(prefix)
    bed2d = cio.load_bed2d(bed2d_path)
    if not inter and len(bed2d.start1[bed2d.chrom1 != bed2d.chrom2]) > 0:
        sys.stderr.write(
            "Warning: The bed2d file contains interchromosomal patterns. "
            "These patterns will not be scanned unless --inter is used.\n"
        )
    if kernel_config_path is not None:
        custom = True
        config_path = kernel_config_path
    else:
        custom = False
        config_path = pattern
    cfg = cio.load_kernel_config(config_path, custom)
    if subsample == "no":
        subsample = None
    hic_genome = HicGenome(
        mat_path, inter=inter, kernel_config=cfg, sample=subsample
    )
    # Scan up to the furthest pair distance
    furthest = np.max(bed2d.start2 - bed2d.start1)
    max_diag = hic_genome.clr.shape[0] * hic_genome.clr.binsize
    cfg["max_dist"] = min(furthest, max_diag)
    cfg["min_dist"] = 0
    cfg["tsvd"] = tsvd
    cfg = _override_kernel_config("max_perc_zero", perc_zero, float, cfg)
    cfg = _override_kernel_config(
        "max_perc_undetected", perc_undetected, float, cfg
    )

    hic_genome.kernel_config = cfg
    hic_genome.normalize(norm=norm, n_mads=n_mads, threads=threads)
    bed2d["score"] = np.nan
    bed2d["pvalue"] = np.nan
    positions = bed2d.copy()
    km, kn = cfg["kernels"][0].shape
    n_kernels = len(cfg["kernels"])
    if win_size != "auto":
        if not win_size % 2:
            raise ValueError("--win-size must be odd")
        for i, k in enumerate(cfg["kernels"]):
            cfg["kernels"][i] = resize_kernel(k, factor=win_size / km)
        km = kn = win_size
        hic_genome.kernel_config = cfg
    hic_genome.compute_max_dist()
    hic_genome.make_sub_matrices()
    windows = np.full((positions.shape[0], km, kn), np.nan)
    bed2d_out = [bed2d.copy() for _ in range(n_kernels)]
    windows_out = [windows.copy() for _ in range(n_kernels)]
    positions["pos1"] = (positions.start1 + positions.end1) // 2
    positions["pos2"] = (positions.start2 + positions.end2) // 2
    for kernel_id, kernel_matrix in enumerate(cfg["kernels"]):
        cio.progress(kernel_id, len(cfg["kernels"]), f"Kernel: {kernel_id}\n")
        n_sub_mats = hic_genome.sub_mats.shape[0]
        sub_pos = [
            _get_chrom_pos(positions, hic_genome, m[1].chr1, m[1].chr2)
            for m in hic_genome.sub_mats.iterrows()
        ]
        sub_mat_data = list(
            zip(
                hic_genome.sub_mats.iterrows(),
                (cfg for _ in range(n_sub_mats)),
                (kernel_matrix for _ in range(n_sub_mats)),
                (s[1] for s in sub_pos),
            )
        )
        sub_mat_results = []
        prefetcher = _Prefetcher(sub_mat_data, threads)
        for s, result in enumerate(prefetcher.map(_quantify_sub_mat)):
            cio.progress(s, n_sub_mats, f"{result['chr1']}-{result['chr2']}")
            sub_mat_results.append(result)

        for i, r in enumerate(sub_mat_results):
            if r["coords"] is None:
                continue
            sub_pat_idx = sub_pos[i][0]
            try:
                bed2d_out[kernel_id].loc[sub_pat_idx, "score"] = r[
                    "coords"
                ].score.values
                bed2d_out[kernel_id].loc[sub_pat_idx, "pvalue"] = r[
                    "coords"
                ].pvalue.values
                windows_out[kernel_id][sub_pat_idx, :, :] = r["windows"]
            except AttributeError:
                pass
    bed2d = pd.concat(bed2d_out, axis=0).reset_index(drop=True)
    windows = np.concatenate(windows_out, axis=0)
    bed2d = (
        bed2d.sort_values("score", ascending=True)
        .groupby(["chrom1", "start1", "chrom2", "start2"], sort=False)
        .tail(1)
    )
    windows = windows[bed2d.index, :, :]
    bed2d = bed2d.reset_index(drop=True)
    bed2d["bin1"] = hic_genome.coords_to_bins(
        bed2d.loc[:, ["chrom1", "start1"]].rename(
            columns={"chrom1": "chrom", "start1": "pos"}
        )
    )
    bed2d["bin2"] = hic_genome.coords_to_bins(
        bed2d.loc[:, ["chrom2", "start2"]].rename(
            columns={"chrom2": "chrom", "start2": "pos"}
        )
    )
    bed2d["qvalue"] = fdr_correction(bed2d["pvalue"])
    bed2d = bed2d.loc[
        :,
        [
            "chrom1",
            "start1",
            "end1",
            "chrom2",
            "start2",
            "end2",
            "bin1",
            "bin2",
            "score",
            "pvalue",
            "qvalue",
        ],
    ]
    bed2d.loc[np.isnan(bed2d.score), "pvalue"] = np.nan
    bed2d.loc[np.isnan(bed2d.score), "qvalue"] = np.nan
    bed2d = bed2d.sort_values(["bin1", "bin2"], ascending=True).reset_index(
        drop=True
    )
    cio.write_patterns(bed2d, prefix)
    cio.save_windows(windows, prefix, fmt=win_fmt)
    if plotting_enabled:
        from chromosight_tpu.plotting import pileup_plot

        pileup_title = ("pileup_of_{n}_{pattern}").format(
            pattern=cfg["name"], n=windows.shape[0]
        )
        windows_pileup = cid.pileup_patterns(windows)
        if not cfg["max_dist"]:
            windows_pileup = np.nan_to_num(windows_pileup)
            windows_pileup += np.transpose(windows_pileup) - np.diag(
                np.diag(windows_pileup)
            )
        sys.stderr.write(f"Saving pileup plots in {prefix}.pdf\n")
        pileup_plot(windows_pileup, prefix, name=pileup_title)


def cmd_generate_config(args):
    """Write a preset (or interactively captured) kernel config
    (reference ``cli:499-598``)."""
    prefix = args["<prefix>"]
    pattern = args["--preset"]
    click_find = args["--click"]
    n_mads = float(args["--n-mads"])
    norm = args["--norm"]
    win_size = args["--win-size"]
    threads = int(args["--threads"])
    inter = args["--inter"]
    chroms = args["--chroms"]

    cfg = cio.load_kernel_config(pattern, False)
    cio.check_prefix_dir(prefix)

    if win_size != "auto":
        win_size = int(win_size)
        if not win_size % 2:
            raise ValueError("--win-size must be odd")
        cfg["kernels"] = [
            resize_kernel(k, factor=win_size / k.shape[0])
            for k in cfg["kernels"]
        ]
    else:
        win_size = cfg["kernels"][0].shape[0]

    if click_find:
        import scipy.ndimage as ndi

        from chromosight_tpu.plotting import click_finder

        hic_genome = HicGenome(click_find, inter=inter, kernel_config=cfg)
        hic_genome.normalize(norm=norm, n_mads=n_mads, threads=threads)
        hic_genome.max_dist = hic_genome.clr.shape[0] * hic_genome.clr.binsize
        hic_genome.make_sub_matrices()
        if chroms is None:
            for sub in hic_genome.sub_mats.iterrows():
                sub[1].contact_map.create_mat()
            processed_mat = hic_genome.gather_sub_matrices().tocsr()
            windows = click_finder(processed_mat, half_w=int((win_size - 1) / 2))
        else:
            chroms = chroms.split(",")
            if inter:
                chroms = it.combinations_with_replacement(chroms, 2)
            else:
                chroms = [(ch, ch) for ch in chroms]
            windows = []
            for c1, c2 in chroms:
                try:
                    sub_mat = hic_genome.sub_mats.query(
                        "(chr1 == @c1) & (chr2 == @c2)"
                    )["contact_map"].values[0]
                except IndexError:
                    c1, c2 = c2, c1
                    sub_mat = hic_genome.sub_mats.query(
                        "(chr1 == @c1) & (chr2 == @c2)"
                    )["contact_map"].values[0]
                sub_mat.create_mat()
                chrom_wins = click_finder(
                    sub_mat.matrix.tocsr(),
                    half_w=int((win_size - 1) / 2),
                    xlab=c2,
                    ylab=c1,
                )
                windows.append(chrom_wins)
                sub_mat.destroy_mat()
            windows = np.concatenate(windows, axis=0)

        pileup = ndi.gaussian_filter(cid.pileup_patterns(windows), 1)
        cfg["kernels"] = [pileup.tolist()]
        from chromosight_tpu.plotting import _plt

        plt = _plt()
        hm = plt.imshow(
            np.log(pileup), vmax=np.percentile(pileup, 99), cmap="afmhot_r"
        )
        cbar = plt.colorbar(hm)
        cbar.set_label("Log10 Hi-C contacts")
        plt.title("Manually generated kernel")
        plt.show()

    # Write kernel matrices as separate text files referenced by the JSON
    # config, byte-compatible with the reference's generate-config output.
    for mat_id, mat in enumerate(cfg["kernels"]):
        mat_path = f"{prefix}.{mat_id + 1}.txt"
        np.savetxt(mat_path, mat)
        cfg["kernels"][mat_id] = mat_path
    with open(f"{prefix}.json", "w") as config_handle:
        json.dump(cfg, config_handle, indent=4, default=_json_default)


def _json_default(obj):
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"not JSON serializable: {type(obj)}")


def cmd_list_kernels(args):
    """List available kernels (reference ``cli:899-925``)."""
    from chromosight_tpu.plotting import print_ascii_mat

    kernel_name = args["--name"]
    if kernel_name == "all":
        kernels = ck.kernel_names
    else:
        kernels = [kernel_name]
    for k in kernels:
        try:
            kernel_infos = getattr(ck, k)
        except AttributeError:
            raise ValueError(f"Kernel {k} is not available")
        print(k)
        if args["--long"]:
            exclude_params = ["name", "resolution", "kernels"]
            for param, value in kernel_infos.items():
                if param not in exclude_params:
                    print(f"  {param}: {value}")
        if args["--mat"]:
            for mat in kernel_infos["kernels"]:
                print_ascii_mat(mat)


def cmd_test(args):
    """Self-test: run detection on the example dataset
    (reference ``cli:928-940``), falling back to the bundled copy when the
    network is unavailable."""
    sys.stderr.write(f"Fetching test dataset at {URL_EXAMPLE_DATASET}...\n")
    tmp_cool = tempfile.NamedTemporaryFile(delete=False)
    tmp_cool.close()
    try:
        cio.download_file(URL_EXAMPLE_DATASET, tmp_cool.name)
        cool_path = tmp_cool.name
    except Exception:
        cool_path = LOCAL_EXAMPLE_DATASET
    sys.stderr.write("Running detection on test dataset...\n")
    args["<contact_map>"] = cool_path
    args["<prefix>"] = "chromosight_test"
    args["--no-plotting"] = True
    cmd_detect(args)
    os.unlink(tmp_cool.name)


@contextmanager
def capture_ouput(stderr_to=None):
    """Capture stderr during the self-test run (reference ``cli:943-958``)."""
    try:
        stderr = sys.stderr
        sys.stderr = c2 = stderr_to or io.StringIO()
        yield c2
    finally:
        sys.stderr = stderr
        try:
            c2.flush()
            c2.seek(0)
        except (ValueError, IOError):
            pass


def logo_version(logo, ver):
    from chromosight_tpu.plotting import print_ascii_mat

    small_logo = resize_kernel(logo, factor=0.33, quiet=True)
    ascii_logo = print_ascii_mat(small_logo, colored=False, print_str=False)
    return f"{ascii_logo} chromosight-tpu version {ver}"


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    try:
        args = parse_args(
            argv, __doc__, version=logo_version(LOGO, __version__)
        )
    except CliError as exc:
        return exc.code
    if args["test"]:
        with capture_ouput() as stderr:
            cmd_test(args)
        obs_log = stderr.read()
        sys.stderr.write(obs_log)
        obs_log_lines = {
            u.strip("\x1b[K") for u in set(obs_log.split("\n")) if "\r" not in u
        }
        exp_log_lines = set(TEST_LOG.split("\n"))
        if len(exp_log_lines ^ obs_log_lines):
            sys.stderr.write(
                "\nWarning, the test log differed from the "
                "expected one. This means the program changed its output from"
                "previous versions. You may ignore this if you are not a "
                "developer.\n\n"
                f"Here is the expected log:\n\n{TEST_LOG}\n"
            )
    elif args["detect"]:
        cmd_detect(args)
    elif args["generate-config"]:
        cmd_generate_config(args)
    elif args["list-kernels"]:
        cmd_list_kernels(args)
    elif args["quantify"]:
        cmd_quantify(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
