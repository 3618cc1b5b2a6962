"""Global configuration for the JAX runtime.

Enables the persistent XLA compilation cache so repeated invocations of the
CLI (and test runs) skip recompilation of the fused detection kernels; on
TPU the first compile of a shape bucket costs tens of seconds, subsequent
runs are cache hits.
"""

from __future__ import annotations

import os


def init_platform():
    """Honor CHROMOSIGHT_TPU_PLATFORM (cpu/tpu/axon/...): some TPU plugins
    override the JAX_PLATFORMS env var, so the choice is applied through
    jax.config after import."""
    platform = os.environ.get("CHROMOSIGHT_TPU_PLATFORM")
    if platform:
        try:
            import jax

            jax.config.update("jax_platforms", platform)
        except Exception:
            pass


def init_compilation_cache():
    init_platform()
    cache_dir = os.environ.get(
        "CHROMOSIGHT_TPU_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "chromosight_tpu",
            "jax_cache",
        ),
    )
    if cache_dir.lower() in ("0", "off", "none", "disabled"):
        return
    try:
        import jax

        # XLA:CPU persists AOT executables tuned to the COMPILING host
        # (machine features incl. XLA-internal pseudo-features like
        # +prefer-no-gather); loading one on a different host/VM can
        # SIGILL/abort mid-run, and the mismatch is not reliably
        # detectable from /proc/cpuinfo.  CPU compiles are cheap — only
        # accelerator (TPU) executables, whose serialized form is
        # host-independent and expensive to rebuild, use the persistent
        # cache.
        if jax.default_backend() == "cpu":
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
