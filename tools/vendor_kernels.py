"""One-shot tool: import the preset pattern templates from a reference
chromosight checkout into the consolidated chromosight-tpu format
(one JSON per pattern with kernel matrices inlined as nested lists).

The preset *data* (template matrices and default detection parameters) must
match the reference numerically for output parity; this tool re-serialises
it into a different, self-contained layout.

Usage: python tools/vendor_kernels.py /path/to/chromosight/kernels
"""

import json
import pathlib
import sys

import numpy as np


def main(src_dir, dst_dir):
    src = pathlib.Path(src_dir)
    dst = pathlib.Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    for cfg_path in sorted(src.glob("*.json")):
        with open(cfg_path) as handle:
            cfg = json.load(handle)
        mats = []
        for rel in cfg["kernels"]:
            mat = np.loadtxt(src / rel)
            mats.append(mat.tolist())
        cfg["kernels"] = mats
        out = dst / cfg_path.name
        with open(out, "w") as handle:
            json.dump(cfg, handle)
        print(f"{cfg_path.name}: {len(mats)} kernel(s) -> {out}")


if __name__ == "__main__":
    src = sys.argv[1]
    dst = (
        pathlib.Path(__file__).parents[1]
        / "chromosight_tpu"
        / "kernels"
        / "data"
    )
    main(src, dst)
