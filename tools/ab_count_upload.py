"""A/B the count-upload representations (u4 / u8 / u16 / f32) on the
cached bench genome: per-chromosome fetch+scatter+upload wall and link
bytes, and a bitwise check that every mode produces the same device band.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_count_upload.py
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

from chromosight_tpu.config import init_compilation_cache

init_compilation_cache()

MODES = {
    "u4": {"CHROMOSIGHT_TPU_COUNT_U4": "1", "CHROMOSIGHT_TPU_COUNT_U8": "1"},
    "u8": {"CHROMOSIGHT_TPU_COUNT_U4": "0", "CHROMOSIGHT_TPU_COUNT_U8": "1"},
    "u16": {"CHROMOSIGHT_TPU_COUNT_U4": "0", "CHROMOSIGHT_TPU_COUNT_U8": "0"},
    "f32": {"CHROMOSIGHT_TPU_COUNT_UPLOAD": "0"},
}


def build_first_map(cool_path):
    import chromosight_tpu.kernels as ck
    from chromosight_tpu import observability as obs
    from chromosight_tpu.runtime.genome import HicGenome

    obs.reset()
    hg = HicGenome(cool_path, kernel_config=dict(ck.loops))
    hg.normalize("auto")
    hg.compute_max_dist()
    hg.make_sub_matrices()
    sub = hg.sub_mats.iloc[0]
    t0 = time.perf_counter()
    sub.contact_map.create_mat()
    band = np.asarray(sub.contact_map.band_dev)  # fences the upload
    dt = time.perf_counter() - t0
    _stages, _counts, byte_totals = obs.snapshot()
    sub.contact_map.destroy_mat()
    return dt, byte_totals.get("upload", 0), band


def main():
    import bench

    cool_path = str(bench.ensure_genome())
    base_env = dict(os.environ)
    results, ref_band = {}, None
    for mode, env in MODES.items():
        os.environ.update(base_env)
        for k, v in env.items():
            os.environ[k] = v
        walls = []
        for rep in range(2):
            dt, up, band = build_first_map(cool_path)
            walls.append(dt)
        if ref_band is None:
            ref_band = band
            bitwise = True
        else:
            bitwise = bool(np.array_equal(band, ref_band))
        results[mode] = {
            "wall_s": [round(w, 2) for w in walls],
            "upload_MB": round(up / 1e6, 1),
            "bitwise_equal_to_first": bitwise,
        }
    os.environ.update(base_env)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
