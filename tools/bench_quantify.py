"""Steady-state genome-scale quantify timing (companion to bench.py).

Scores the planted-loop truth coordinates of the cached bench genome
with `chromosight-tpu quantify` twice in-process (cached compiles) and
reports both walls — the second run is the steady-state number recorded
in NOTES.md.  Reuses bench.py's genome cache (generates it if absent).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_quantify.py
"""

import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

from chromosight_tpu.config import init_compilation_cache

init_compilation_cache()


def run_quantify(cool_path, bed2d, prefix):
    from contextlib import redirect_stdout

    from chromosight_tpu.cli import main as climain

    argv_save = sys.argv
    sys.argv = [
        "chromosight",
        "quantify",
        "--no-plotting",
        "--threads",
        "4",
        str(bed2d),
        str(cool_path),
        str(prefix),
    ]
    try:
        with redirect_stdout(sys.stderr):
            climain.main()
    except SystemExit as exc:
        if exc.code not in (None, 0):
            raise
    finally:
        sys.argv = argv_save


def main():
    import numpy as np
    import pandas as pd

    import bench

    cool_path = bench.ensure_genome()
    truth = pathlib.Path(str(cool_path) + ".truth.bed2d")

    from chromosight_tpu import observability as obs

    walls = []
    with tempfile.TemporaryDirectory() as tmp:
        for rep in range(2):
            obs.reset()
            t0 = time.perf_counter()
            run_quantify(cool_path, truth, os.path.join(tmp, f"q{rep}"))
            walls.append(time.perf_counter() - t0)
        stages, _counts, byte_totals = obs.snapshot()
        out = pd.read_csv(os.path.join(tmp, "q1.tsv"), sep="\t")
    scored = int(out["score"].notna().sum())
    print(
        json.dumps(
            {
                "metric": "genome-scale quantify (truth coords, cool->tsv)",
                "walls_s": [round(w, 2) for w in walls],
                "steady_state_s": round(walls[-1], 2),
                "n_coords": int(len(out)),
                "n_scored": scored,
                "median_score": round(float(np.nanmedian(out["score"])), 3),
                "stage_s": {k: round(v, 2) for k, v in sorted(stages.items())},
                "upload_MB": round(byte_totals.get("upload", 0) / 1e6, 1),
                "download_MB": round(
                    byte_totals.get("download", 0) / 1e6, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
