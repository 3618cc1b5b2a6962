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


def _host_fingerprint():
    """Short hash of the host's CPU feature flags.

    XLA:CPU persists AOT executables whose machine code targets the CPU
    features of the COMPILING host; loading such an entry on a host with
    different features (e.g. a VM swap from an AMX-capable machine) can
    SIGILL/abort mid-run.  Namespacing the cache directory by a CPU-flag
    fingerprint makes each machine type populate its own cache — a host
    swap costs recompiles, never a crash.
    """
    import hashlib

    ident = None
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    ident = line
                    break
    except OSError:
        pass
    if ident is None:
        import platform as _platform

        ident = f"{_platform.machine()}-{_platform.processor()}"
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


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
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
