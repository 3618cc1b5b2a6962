"""Model family registry.

In a template-matching framework the "models" are the pattern kernels:
each family (loops, borders, hairpins, centromeres, stripes) is a set of
template matrices plus its detection hyper-parameters.  This module is an
alias of :mod:`chromosight_tpu.kernels` under the conventional name, so
``chromosight_tpu.models.loops`` and ``chromosight_tpu.kernels.loops``
are the same objects.
"""

import sys

import chromosight_tpu.kernels as _kernels

sys.modules[__name__] = _kernels
