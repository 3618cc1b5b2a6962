"""Multi-chip scaling: device meshes and sharded detection steps.

The reference parallelises with a multiprocessing pool over chromosome
submatrices (reference ``cli/chromosight.py:748-750``).  Here the analog is
a JAX device mesh with two axes:

* ``dp`` - data parallel over chromosomes (a batch of band tensors),
* ``sp`` - sequence parallel over genomic position (band rows).

Band tensors are sharded along rows; XLA GSPMD inserts the halo
collective-permutes required by the convolution windows at shard
boundaries, which ride the ICI mesh.
"""

from chromosight_tpu.parallel.mesh import (
    auto_mesh,
    detect_on_mesh,
    make_mesh,
    shard_band,
    sharded_band_detect,
)

__all__ = [
    "auto_mesh",
    "detect_on_mesh",
    "make_mesh",
    "shard_band",
    "sharded_band_detect",
]
