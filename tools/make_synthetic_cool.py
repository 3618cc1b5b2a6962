"""Generate a synthetic genome-scale .cool file with planted loops.

Used to exercise the band engine at human-like scale (the BASELINE.json
"human 5kb genome-wide detect" configs) without shipping a multi-GB
dataset.  Produces a power-law contact decay, ICE-like weights, missing
bins, and planted loop anchors whose ground-truth coordinates are written
alongside as a bed2d file.

Usage: python tools/make_synthetic_cool.py out.cool --bins 30000 --chroms 3
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def synth_chrom(n, binsize, rng, max_d=600, loop_density=0.001):
    """COO triplets (local) for one chromosome + planted loop positions."""
    # expected contacts ~ power law; sample sparsely per diagonal
    rows_l, cols_l, vals_l = [], [], []
    for d in range(0, max_d):
        # Real 5 kb maps are near-dense within the 2 Mb scan band (the
        # default max_perc_zero tolerance is 10%), with a power-law decay
        # of the mean count.
        lam = 80.0 / (1 + d) ** 0.8
        keep_p = 0.97 if d < 450 else 0.5
        m = n - d
        sel = rng.rand(m) < keep_p
        idx = np.flatnonzero(sel)
        if len(idx) == 0:
            continue
        counts = rng.poisson(max(lam, 0.5), size=len(idx)) + 1
        rows_l.append(idx)
        cols_l.append(idx + d)
        vals_l.append(counts)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l).astype(np.float64)

    # plant loops: enriched blocks at random (i, j) with 40 <= j-i <= 400
    n_loops = max(3, int(n * loop_density))
    loops = []
    extra_r, extra_c, extra_v = [], [], []
    for _ in range(n_loops):
        i = rng.randint(20, n - 420)
        d = rng.randint(40, 400)
        j = i + d
        loops.append((i, j))
        for u in range(-2, 3):
            for v in range(-2, 3):
                w = np.exp(-(u * u + v * v) / 2.0)
                extra_r.append(i + u)
                extra_c.append(j + v)
                extra_v.append(30.0 * w)
    rows = np.concatenate([rows, np.array(extra_r)])
    cols = np.concatenate([cols, np.array(extra_c)])
    vals = np.concatenate([vals, np.array(extra_v)])
    # aggregate duplicates
    flat = rows * n + cols
    order = np.argsort(flat)
    flat, rows, cols, vals = flat[order], rows[order], cols[order], vals[order]
    uniq, start = np.unique(flat, return_index=True)
    agg = np.add.reduceat(vals, start)
    rows = (uniq // n).astype(np.int64)
    cols = (uniq % n).astype(np.int64)
    # Real cooler files store integer counts as int32; keep the fixture
    # realistic (values are integral after the round).
    return rows, cols, np.round(agg).astype(np.int32), loops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--bins", type=int, default=30000)
    ap.add_argument("--chroms", type=int, default=3)
    ap.add_argument("--binsize", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--trans-density",
        type=float,
        default=0.0,
        help="fraction of each trans (inter-chromosomal) pair's cells "
        "holding a random contact (exercises --inter at scale)",
    )
    args = ap.parse_args()

    from chromosight_tpu.io.cool import create_cool
    from chromosight_tpu.ops.balance import ice_balance
    from chromosight_tpu.io.cool import CoolFile

    rng = np.random.RandomState(args.seed)
    bins_rows = []
    px_rows = []
    loop_rows = []
    offset = 0
    for c in range(args.chroms):
        name = f"chr{c + 1}"
        n = args.bins
        rows, cols, vals, loops = synth_chrom(n, args.binsize, rng)
        bins_rows.append(
            pd.DataFrame(
                {
                    "chrom": name,
                    "start": np.arange(n) * args.binsize,
                    "end": (np.arange(n) + 1) * args.binsize,
                }
            )
        )
        px_rows.append(
            pd.DataFrame(
                {
                    "bin1_id": rows + offset,
                    "bin2_id": cols + offset,
                    "count": vals,
                }
            )
        )
        for i, j in loops:
            loop_rows.append(
                (
                    name,
                    i * args.binsize,
                    (i + 1) * args.binsize,
                    name,
                    j * args.binsize,
                    (j + 1) * args.binsize,
                )
            )
        offset += n
    # sparse uniform trans contacts between every chromosome pair
    if args.trans_density > 0:
        n = args.bins
        for c1 in range(args.chroms):
            for c2 in range(c1 + 1, args.chroms):
                m = int(args.trans_density * n * n)
                r = rng.randint(0, n, m) + c1 * n
                q = rng.randint(0, n, m) + c2 * n
                tp = pd.DataFrame(
                    {
                        "bin1_id": r,
                        "bin2_id": q,
                        "count": (rng.poisson(2.0, m) + 1).astype(
                            np.int32
                        ),
                    }
                )
                # collapse colliding samples: one row per matrix cell
                tp = (
                    tp.groupby(["bin1_id", "bin2_id"], as_index=False)[
                        "count"
                    ].sum()
                )
                px_rows.append(tp)
    bins = pd.concat(bins_rows, ignore_index=True)
    pixels = pd.concat(px_rows, ignore_index=True)
    # concat/groupby upcast to int64; counts fit int32 (cooler's dtype)
    pixels["count"] = pixels["count"].astype(np.int32)
    create_cool(args.out, bins, pixels, metadata={"synthetic": True})
    # balance so the detect pipeline can run with norm=auto
    ice_balance(CoolFile(args.out), cis_only=True, store=True)
    truth = pd.DataFrame(
        loop_rows,
        columns=["chrom1", "start1", "end1", "chrom2", "start2", "end2"],
    )
    truth.to_csv(args.out + ".truth.bed2d", sep="\t", index=False, header=False)
    print(
        f"wrote {args.out}: {len(bins)} bins, {len(pixels)} pixels, "
        f"{len(truth)} planted loops"
    )


if __name__ == "__main__":
    main()
