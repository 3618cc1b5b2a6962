"""Compatibility aliases mirroring the reference package layout.

The reference exposes its layers under ``chromosight.utils.*``
(``detection``, ``preprocessing``, ``io``, ``stats``, ``plotting``,
``contacts_map``).  chromosight-tpu organises the same functionality by
tier (ops / runtime / io / detection), but user code written against the
reference import paths works unchanged through these aliases:

.. code-block:: python

    import chromosight_tpu.utils.detection as cud
    corr, pvals = cud.normxcorr2(mat, kernel)
"""

import sys

import chromosight_tpu.detection as detection
import chromosight_tpu.io as io
import chromosight_tpu.plotting as plotting
import chromosight_tpu.preprocessing as preprocessing
import chromosight_tpu.stats as stats
from chromosight_tpu import runtime as contacts_map

# Register as importable submodules (``import chromosight_tpu.utils.io``)
sys.modules[__name__ + ".detection"] = detection
sys.modules[__name__ + ".preprocessing"] = preprocessing
sys.modules[__name__ + ".io"] = io
sys.modules[__name__ + ".stats"] = stats
sys.modules[__name__ + ".plotting"] = plotting
sys.modules[__name__ + ".contacts_map"] = contacts_map

__all__ = [
    "detection",
    "preprocessing",
    "io",
    "stats",
    "plotting",
    "contacts_map",
]
