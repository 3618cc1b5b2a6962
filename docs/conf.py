# Sphinx configuration for chromosight-tpu.
#
# Build with:  sphinx-build -b html docs docs/_build
# (requirements: sphinx, sphinx_rtd_theme, nbsphinx for the notebooks)

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "chromosight-tpu"
copyright = "2026, chromosight-tpu contributors"
author = "chromosight-tpu contributors"

try:
    from chromosight_tpu.version import __version__ as release
except Exception:
    release = "0.0.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

# The tutorial notebooks render through nbsphinx when it is available.
try:
    import nbsphinx  # noqa: F401

    extensions.append("nbsphinx")
except ImportError:
    exclude_patterns = ["notebooks/*.ipynb"]

# The markdown tutorial/architecture pages render through myst.
try:
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
    source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
except ImportError:
    exclude_patterns = globals().get("exclude_patterns", []) + ["*.md"]

autodoc_member_order = "bysource"
autodoc_mock_imports = ["jax", "jaxlib", "h5py", "matplotlib"]

templates_path = ["_templates"]
exclude_patterns = globals().get("exclude_patterns", []) + [
    "_build",
    "Thumbs.db",
    ".DS_Store",
]

intersphinx_mapping = {
    "numpy": ("https://numpy.org/doc/stable/", None),
    "scipy": ("https://docs.scipy.org/doc/scipy/", None),
    "pandas": ("https://pandas.pydata.org/docs/", None),
}

html_theme = "sphinx_rtd_theme"
html_static_path = []
