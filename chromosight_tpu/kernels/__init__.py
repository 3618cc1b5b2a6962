"""Preset pattern-kernel library.

Each built-in pattern (loops, borders, hairpins, centromeres, stripes, ...)
is exposed as a module-level dict whose keys mirror the JSON config and
whose ``kernels`` entry holds the template matrices as 2D numpy arrays,
exactly like the reference ``chromosight.kernels`` module
(reference ``kernels/__init__.py:29-44``):

.. code-block:: python

    import chromosight_tpu.kernels as ck
    kernel = ck.loops["kernels"][0]
    names = ck.kernel_names
"""

import pathlib
import sys

from chromosight_tpu.io.config import load_kernel_config

_current_module = sys.modules[__name__]
_data_dir = pathlib.Path(__file__).parent / "data"

kernel_names = []
for _cfg_file in sorted(_data_dir.glob("*.json")):
    _pattern_name = _cfg_file.stem
    setattr(
        _current_module,
        _pattern_name,
        load_kernel_config(_pattern_name, custom=False),
    )
    kernel_names.append(_pattern_name)
