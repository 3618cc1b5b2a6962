"""Whole-genome Hi-C runtime: bookkeeping, balancing, submatrix scheduling.

Mirrors the reference ``HicGenome`` (``contacts_map.py:79-450``): owns the
cool handle and bin tables, runs/reuses ICE balancing, builds one
``ContactMap`` per chromosome pair and converts between genome-bin,
submatrix-bin and basepair coordinate systems.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import scipy.sparse as sp

import chromosight_tpu.io as cio
from chromosight_tpu.io.cool import CoolFile
from chromosight_tpu.ops.balance import ice_balance
from chromosight_tpu.runtime.contact_map import ContactMap


class HicGenome:
    """Relationships between the whole genome matrix and its sub-matrices.

    Reference: ``contacts_map.py:79-164`` for construction semantics.
    """

    def __init__(
        self,
        path,
        inter=False,
        kernel_config=None,
        dump=None,
        smooth=False,
        sample=None,
    ):
        try:
            self.dump = Path(dump)
            os.makedirs(self.dump, exist_ok=True)
        except TypeError:
            self.dump = None
        self.clr = CoolFile(path)
        self.bins = self.clr.bins()
        self.smooth = smooth
        self.kernel_config = kernel_config
        self.sub_mats = None
        self.detectable_bins = np.array(range(self.clr.shape[0]))
        self.inter = inter
        self.compute_max_dist()
        self.use_norm = True
        if sample is not None:
            sample = float(sample)
            if "sum" not in self.clr.info:
                raise IOError(
                    "sum info missing from cool file. Please fix the file."
                )
            total = self.clr.info["sum"]
            if sample > total:
                print(
                    "sample value is higher than total contacts,"
                    "skipping subsampling."
                )
                self.sample = None
            elif sample > 1:
                self.sample = sample / total
            elif sample > 0:
                self.sample = sample
            else:
                raise ValueError("Sample must be a positive value or None")
        else:
            self.sample = sample

    def compute_max_dist(self):
        """Derive the scanning distance (bins) from the kernel config.

        Reference: ``contacts_map.py:166-180``.
        """
        try:
            self.max_dist = max(
                self.kernel_config["max_dist"] // self.clr.binsize, 1
            )
            self.largest_kernel = max(
                s.shape[0] for s in self.kernel_config["kernels"]
            )
        except (ValueError, TypeError):
            self.max_dist = None
            self.largest_kernel = 3

    def normalize(self, norm="auto", n_mads=5, threads=1):
        """Reuse or (re)compute ICE balancing weights.

        Reference: ``contacts_map.py:182-233``.  ``threads`` is accepted
        for CLI compatibility; the balancing itself is a vectorized
        single-pass computation here.
        """
        if norm not in ["auto", "raw", "force"]:
            raise ValueError("norm must be one of: auto, raw, force")
        if "weight" in self.bins.columns and norm != "force":
            sys.stderr.write("Matrix already balanced, reusing weights\n")
        else:
            from chromosight_tpu.observability import stage

            with stage("balance: ICE"):
                ice_balance(
                    self.clr,
                    mad_max=n_mads,
                    cis_only=not self.inter,
                    ignore_diags=2,
                    max_iters=200,
                    min_nnz=10,
                    chunksize=10_000_000,
                    store=True,
                )
            print("Whole genome matrix balanced")
            self.bins = self.clr.bins()
        self.use_norm = norm != "raw"
        self.detectable_bins = np.flatnonzero(np.isfinite(self.bins.weight))
        print(
            f"Found {len(self.detectable_bins)} / {self.clr.shape[0]}"
            " detectable bins"
        )

    def make_sub_matrices(self):
        """Build the table of per-chromosome-pair ContactMaps (lazy).

        Reference: ``contacts_map.py:235-322``.
        """
        sub_cols = ["chr1", "chr2", "contact_map"]
        n_chroms = len(self.clr.chromnames)
        if self.inter:
            n_rows = int(n_chroms**2 / 2 + n_chroms / 2)
        else:
            n_rows = n_chroms
        sub_mats = pd.DataFrame(
            np.full((n_rows, 3), None, dtype=object), columns=sub_cols
        )

        d = self.detectable_bins
        sys.stderr.write("Preprocessing sub-matrices...\n")
        if self.sample is not None:
            sys.stderr.write(
                f"{np.round(100 * self.sample)}% contacts will be sampled \n"
            )
        sub_mat_idx = 0
        for i1, chr1 in enumerate(self.clr.chromnames):
            for i2, chr2 in enumerate(self.clr.chromnames):
                if not (i1 == i2 or (i1 < i2 and self.inter)):
                    continue
                s1, e1 = self.clr.extent(chr1)
                s2, e2 = self.clr.extent(chr2)
                cio.progress(sub_mat_idx, n_rows, f"{chr1}-{chr2}")
                sub_detectable = (
                    d[(d >= s1) & (d < e1)] - s1,
                    d[(d >= s2) & (d < e2)] - s2,
                )
                map_kwargs = dict(
                    smooth=self.smooth,
                    sample=self.sample,
                    dump=self.dump,
                    use_norm=self.use_norm,
                    extent=[(s1, e1), (s2, e2)],
                    detectable_bins=sub_detectable,
                    name=f"{chr1}-{chr2}",
                )
                if i1 == i2:
                    cm = ContactMap(
                        self.clr,
                        inter=False,
                        max_dist=self.max_dist,
                        largest_kernel=self.largest_kernel,
                        **map_kwargs,
                    )
                else:
                    cm = ContactMap(self.clr, inter=True, **map_kwargs)
                sub_mats.loc[sub_mat_idx, "contact_map"] = cm
                sub_mats.loc[sub_mat_idx, "chr1"] = chr1
                sub_mats.loc[sub_mat_idx, "chr2"] = chr2
                sub_mat_idx += 1
        cio.progress(
            sub_mat_idx,
            n_rows,
            (
                f"{sub_mats.loc[sub_mat_idx - 1, 'chr1']}-"
                f"{sub_mats.loc[sub_mat_idx - 1, 'chr2']}\n"
            ),
        )
        self.sub_mats = sub_mats
        print("Sub matrices extracted")

    def gather_sub_matrices(self):
        """Assemble processed submatrices into a whole-genome sparse
        matrix (COO concatenation — O(nnz), genome-scale safe)."""
        rows, cols, vals = [], [], []
        for _, r1 in self.sub_mats.iterrows():
            s1, _ = self.clr.extent(r1.chr1)
            s2, _ = self.clr.extent(r1.chr2)
            block = r1.contact_map.matrix
            if block is None:
                continue
            coo = sp.coo_matrix(block)
            rows.append(coo.row.astype(np.int64) + s1)
            cols.append(coo.col.astype(np.int64) + s2)
            vals.append(coo.data)
        if not rows:
            return sp.csr_matrix(self.clr.shape)
        gathered = sp.coo_matrix(
            (
                np.concatenate(vals),
                (np.concatenate(rows), np.concatenate(cols)),
            ),
            shape=self.clr.shape,
        ).tocsr()
        return sp.triu(gathered)

    # -------------------------------------------------------------- #
    # Coordinate conversions (contacts_map.py:336-450)
    # -------------------------------------------------------------- #
    def get_full_mat_pattern(self, chr1, chr2, patterns):
        """Shift submatrix bins to whole-genome bins."""
        full_patterns = patterns.copy()
        start1, _ = self.clr.extent(chr1)
        start2, _ = self.clr.extent(chr2)
        full_patterns.bin1 += start1
        full_patterns.bin2 += start2
        return full_patterns

    def get_sub_mat_pattern(self, chr1, chr2, patterns):
        """Shift whole-genome bins to submatrix bins."""
        sub_patterns = patterns.copy()
        start1, _ = self.clr.extent(chr1)
        start2, _ = self.clr.extent(chr2)
        sub_patterns.bin1 -= start1
        sub_patterns.bin2 -= start2
        return sub_patterns

    def bins_to_coords(self, bin_idx):
        """Genomic coordinates (chrom, start, end) of whole-genome bins."""
        return self.bins.iloc[bin_idx, :]

    def coords_to_bins(self, coords):
        """Whole-genome bin ids of (chrom, pos) coordinate pairs."""
        coords = coords.copy()
        coords.pos = (coords.pos // self.clr.binsize) * self.clr.binsize
        bins = self.bins.copy()
        bins["chrom"] = bins["chrom"].astype(str)
        idx = (
            bins.reset_index()
            .rename(columns={"index": "bin_idx"})
            .merge(
                coords.reset_index().rename(columns={"index": "coord_idx"}),
                left_on=["chrom", "start"],
                right_on=["chrom", "pos"],
                how="right",
            )
            .set_index("bin_idx")
            .sort_values("coord_idx")
            .index.values
        )
        return idx
