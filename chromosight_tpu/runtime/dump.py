"""Stage-snapshot dump subsystem (--dump DIR).

Mirrors the reference ``DumpMatrix`` decorator (``contacts_map.py:23-76``):
after the wrapped method runs, the instance's ``matrix`` attribute is saved
as a compressed scipy-sparse npz so every pipeline stage can be inspected
or diffed against the reference implementation's dumps.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import scipy.sparse as sp


class DumpMatrix:
    """Method decorator that snapshots ``inst.matrix`` after the call.

    The dump path is ``inst.dump / f"{inst.name}_{dump_name}"`` (or just
    ``dump_name`` when the instance has no name). Instances with
    ``dump=None`` skip dumping entirely.
    """

    def __init__(self, dump_name):
        self.dump_name = dump_name

    def __call__(self, fn, *args, **kwargs):
        def decorated_fn(*args, **kwargs):
            res = fn(*args, **kwargs)
            inst = args[0]
            if (
                hasattr(inst, "matrix")
                and getattr(inst, "dump", None) is not None
                and self.dump_name is not None
            ):
                if getattr(inst, "name", None):
                    dump_path = Path(inst.dump) / f"{inst.name}_{self.dump_name}"
                else:
                    dump_path = Path(inst.dump) / f"{self.dump_name}"
                print(
                    f"Dumping matrix to {dump_path}"
                    f" after executing {fn.__name__}"
                )
                mat = inst.matrix
                if not sp.issparse(mat):
                    mat = sp.csr_matrix(np.asarray(mat))
                sp.save_npz(dump_path, mat)
            return res

        return decorated_fn
