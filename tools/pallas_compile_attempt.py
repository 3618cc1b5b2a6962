"""Attempt ONE native Mosaic compile+run of band_normxcorr_pallas on the
real TPU (VERDICT r4 #5: land it or fence it).

Runs the kernel on a tiny bucket shape with interpret=False, bounded by
the caller's timeout.  Prints one JSON line {ok, seconds, error}.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from chromosight_tpu.config import init_compilation_cache

init_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from chromosight_tpu.ops.pallas_band import band_normxcorr_pallas

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    n, width = 2048, 128
    rng = np.random.default_rng(0)
    band = jnp.asarray(rng.random((n, width)), jnp.float32)
    missing = jnp.zeros((n,), bool)
    K = np.asarray(
        __import__("chromosight_tpu.kernels", fromlist=["loops"]).loops[
            "kernels"
        ][0],
        np.float32,
    )
    t0 = time.time()
    try:
        out = band_normxcorr_pallas(
            band,
            missing,
            jnp.asarray(K),
            K.shape,
            n,
            width - 1,
            0.5,
            0.3,
            interpret=False,
        )
        val = float(np.asarray(out[0])[5, 5])
        dt = time.time() - t0
        print(json.dumps({"ok": True, "seconds": round(dt, 1), "probe": val}))
    except Exception as exc:
        dt = time.time() - t0
        print(
            json.dumps(
                {"ok": False, "seconds": round(dt, 1), "error": repr(exc)[:500]}
            )
        )


if __name__ == "__main__":
    main()
