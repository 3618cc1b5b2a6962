"""Kernel-configuration loading.

Accepts two on-disk formats:

1. The reference chromosight format (reference ``utils/io.py:81-205``): a
   JSON file whose ``kernels`` field lists *paths* to whitespace-separated
   dense text matrices, relative to the JSON file.
2. The consolidated chromosight-tpu preset format, where ``kernels`` holds
   the matrices inline as nested lists (one JSON file per pattern, no side
   files).

Both are validated against the same jsonschema as the reference
(reference ``utils/io.py:142-166``) so user-provided config files are
interchangeable between the two implementations.
"""

from __future__ import annotations

import json
import pathlib
import sys
from os.path import join

import numpy as np

try:
    from jsonschema import validate, ValidationError

    _HAVE_JSONSCHEMA = True
except ImportError:  # pragma: no cover - jsonschema is a hard dep in practice
    _HAVE_JSONSCHEMA = False

# Schema identical in content to the reference (utils/io.py:142-166), with
# "kernels" widened to also accept inline matrices (arrays of arrays of
# numbers).
KERNEL_SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "kernels": {
            "type": "array",
            "items": {
                "anyOf": [
                    {"type": "string"},
                    {
                        "type": "array",
                        "items": {
                            "type": "array",
                            "items": {"type": "number"},
                        },
                    },
                ]
            },
        },
        "min_dist": {"type": "number", "minimum": 0},
        "max_dist": {"type": "number", "minimum": 0},
        "max_iterations": {"type": "number", "minimum": 0},
        "min_separation": {"type": "number", "minimum": 1},
        "max_perc_undetected": {"type": "number", "minimum": 0},
        "max_perc_zero": {"type": "number", "minimum": 0},
        "pearson": {"type": "number"},
        "resolution": {"type": "number"},
    },
    "required": [
        "name",
        "kernels",
        "min_dist",
        "max_dist",
        "max_iterations",
        "min_separation",
        "pearson",
        "resolution",
    ],
}


def _preset_dir():
    return pathlib.Path(__file__).parents[1] / "kernels" / "data"


def preset_names():
    """Names of the built-in pattern configurations."""
    return sorted(p.stem for p in _preset_dir().glob("*.json"))


def load_kernel_config(kernel, custom=False):
    """Load a kernel configuration from a preset name or a JSON file path.

    Mirrors the reference ``utils/io.py:81-205``: the returned dict has all
    config keys plus ``kernels`` replaced by a list of 2D float arrays.

    Parameters
    ----------
    kernel : str
        Preset name (custom=False) or path to a JSON config (custom=True).
    custom : bool
        Whether ``kernel`` is a path to a user-supplied config file.
    """
    if custom:
        config_path = str(kernel)
    else:
        config_path = join(_preset_dir(), f"{kernel}.json")

    try:
        with open(config_path, "r") as handle:
            kernel_config = json.load(handle)
    except FileNotFoundError:
        if custom:
            sys.stderr.write(
                f"Error: Kernel configuration file {config_path} does not "
                "exist.\n"
            )
        else:
            sys.stderr.write(
                f"Error: No preset configuration for pattern {kernel}.\n"
            )
        raise

    if _HAVE_JSONSCHEMA:
        try:
            validate(kernel_config, KERNEL_SCHEMA)
        except ValidationError:
            sys.stderr.write("Invalid kernel configuration\n")
            raise

    mats = []
    for entry in kernel_config["kernels"]:
        if isinstance(entry, str):
            # Reference format: path relative to the config file.
            mat_path = join(pathlib.Path(config_path).parent, entry)
            mats.append(np.loadtxt(mat_path))
        else:
            mats.append(np.asarray(entry, dtype=np.float64))
    kernel_config["kernels"] = mats
    return kernel_config
