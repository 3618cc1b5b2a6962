"""Terminal progress bar with the same UX as the reference (io.py:259-281)."""

from __future__ import annotations

import sys


def progress(count, total, status=""):
    """Draw an ANSI progress bar on stderr."""
    bar_len = 20
    filled_len = int(round(bar_len * count / float(total)))
    percents = round(100.0 * count / float(total), 1)
    bar = "=" * filled_len + "-" * (bar_len - filled_len)
    sys.stderr.write("\r [%s] %s%s %s\033[K" % (bar, percents, "%", status))
    sys.stderr.flush()
