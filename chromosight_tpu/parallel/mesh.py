"""Device-mesh helpers and the sharded band-detection step."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, dp=1):
    """Build a (dp, sp) mesh over the first ``n_devices`` devices.

    ``dp`` chromosome-batch shards x ``sp`` genomic-row shards.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % dp:
        raise ValueError("dp must divide n_devices")
    arr = np.array(devices[:n_devices]).reshape(dp, n_devices // dp)
    return Mesh(arr, ("dp", "sp"))


def shard_band(band, missing, mesh):
    """Place a batched band tensor (b, n, W) and missing flags (b, n) on the
    mesh: batch over dp, rows over sp, diagonals replicated."""
    band_sharding = NamedSharding(mesh, P("dp", "sp", None))
    miss_sharding = NamedSharding(mesh, P("dp", None))
    return (
        jax.device_put(band, band_sharding),
        jax.device_put(missing, miss_sharding),
    )


def sharded_band_detect(
    bands,
    missing,
    kernel,
    sheared,
    sheared_sq,
    kernel_shape,
    n,
    max_dist,
    missing_tol,
    pearson_min,
    mesh,
):
    """One fused detection step over a batch of band tensors on a mesh.

    vmaps the fused band normxcorr over the chromosome batch; inputs are
    sharded (dp over batch, sp over band rows), so XLA partitions the
    convolutions spatially and inserts halo exchange on the sp axis.

    Returns (corr, log10_pvals, candidates), each (b, n_pad, W).
    """
    from chromosight_tpu.ops.band import band_normxcorr

    def one(band, miss):
        return band_normxcorr(
            band,
            miss,
            kernel,
            sheared,
            sheared_sq,
            kernel_shape,
            n,
            max_dist,
            missing_tol,
            pearson_min,
        )

    bands, missing = shard_band(bands, missing, mesh)
    out_shardings = (
        NamedSharding(mesh, P("dp", "sp", None)),
        NamedSharding(mesh, P("dp", "sp", None)),
        NamedSharding(mesh, P("dp", "sp", None)),
    )
    fn = jax.jit(jax.vmap(one), out_shardings=out_shardings)
    return fn(bands, missing)
