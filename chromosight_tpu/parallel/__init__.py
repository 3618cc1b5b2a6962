"""Multi-chip scaling: device meshes and sharded detection steps.

The reference parallelises with a multiprocessing pool over chromosome
submatrices (reference ``cli/chromosight.py:748-750``).  Here the analog is
a JAX device mesh with two axes:

* ``dp`` - data parallel over chromosomes (a batch of band tensors),
* ``sp`` - sequence parallel over genomic position (band rows).

Band tensors are sharded along rows.  Two engines implement the ``sp``
axis: ``sharded_band_detect`` lets XLA GSPMD infer the halo
collective-permutes for the row-sharded convolutions, and
``shard_map_band_detect`` performs the halo exchange explicitly with
``lax.ppermute`` (two kernel-halo slab sends total, missing-flags
replicated — no shard-sized relay of the ``sliding_vector`` skew),
calling identical pixels with ~1e-6 score agreement.  Both ride the ICI
mesh.
"""

from chromosight_tpu.parallel.mesh import (
    auto_mesh,
    detect_on_mesh,
    make_mesh,
    shard_band,
    sharded_band_detect,
)
from chromosight_tpu.parallel.shard_map_band import shard_map_band_detect

__all__ = [
    "auto_mesh",
    "detect_on_mesh",
    "make_mesh",
    "shard_band",
    "shard_map_band_detect",
    "sharded_band_detect",
]
