"""Command-line interface: detect / quantify / generate-config /
list-kernels / test subcommands, grammar-compatible with the reference
(reference ``cli/chromosight.py:8-151``)."""
