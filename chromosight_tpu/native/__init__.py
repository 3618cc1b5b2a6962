"""Native (C++) host kernels, bound via ctypes with transparent fallback.

Builds ``kernels.cpp`` into ``_native.so`` on first use (g++, cached next
to the source); every entry point has a pure-numpy fallback so the
framework works without a toolchain.  Set CHROMOSIGHT_TPU_NO_NATIVE=1 to
disable.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys
import threading

import numpy as np

_HERE = pathlib.Path(__file__).parent
_LIB = None
_TRIED = False
_LOCK = threading.Lock()


def _build(openmp=True, force=False):
    src = _HERE / "kernels.cpp"
    out = _HERE / "_native.so"
    if not force and out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(src),
        "-o",
        str(out),
    ]
    if openmp:
        cmd.insert(5, "-fopenmp")
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        if not openmp:
            raise
        # toolchains without libgomp
        cmd.remove("-fopenmp")
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    """Build then dlopen, retrying once without OpenMP when the runtime
    loader cannot resolve libgomp (compile-time success does not imply
    the .so is loadable on this host)."""
    path = _build()
    try:
        return ctypes.CDLL(str(path))
    except OSError:
        path = _build(openmp=False, force=True)
        return ctypes.CDLL(str(path))


def get_lib():
    """Load (building if needed) the native library, or None.

    Thread-safe: concurrent first callers (the threaded per-chromosome
    map creation) block on the build/load instead of observing a
    half-initialized state — setting the tried flag before the load
    completed made racing threads silently take the numpy/f32 fallback
    paths for their whole call (seen as nondeterministic upload-byte /
    host-time inflation in genome benchmarks)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        return _load_locked()


def _load_locked():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    if os.environ.get("CHROMOSIGHT_TPU_NO_NATIVE"):
        _TRIED = True
        return None
    try:
        lib = _load()
        lib.cc_label.restype = ctypes.c_int64
        lib.cc_label.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.coo_to_band_f64.restype = None
        lib.coo_to_band_f64.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.coo_to_band_f32.restype = None
        lib.coo_to_band_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        for suffix, ctype in (
            ("f64", ctypes.c_double),
            ("i32", ctypes.c_int32),
            ("i64", ctypes.c_int64),
        ):
            fn = getattr(lib, f"band_scatter_fused_{suffix}")
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctype),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
        for suffix, ctype in (
            ("i32", ctypes.c_int32),
            ("i64", ctypes.c_int64),
            ("f64", ctypes.c_double),
        ):
            fn = getattr(lib, f"band_scatter_counts_{suffix}")
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctype),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint16),
            ]
        # indptr-driven count scatters come in b2-int64 and b2-int32
        # flavors (minimal-dtype cool files store 4-byte ids; reading
        # them straight skips a whole-table host cast).
        for b2suf, b2ctype in (("", ctypes.c_int64), ("_b2i32", ctypes.c_int32)):
            for suffix, ctype in (
                ("i32", ctypes.c_int32),
                ("i64", ctypes.c_int64),
                ("f64", ctypes.c_double),
            ):
                fn = getattr(lib, f"band_scatter_counts_indptr_{suffix}{b2suf}")
                fn.restype = ctypes.c_int64
                fn.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(b2ctype),
                    ctypes.POINTER(ctype),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint16),
                ]
                fn8 = getattr(
                    lib, f"band_scatter_counts_u8_indptr_{suffix}{b2suf}"
                )
                fn8.restype = ctypes.c_int64
                fn8.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(b2ctype),
                    ctypes.POINTER(ctype),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                ]
                fn4 = getattr(
                    lib, f"band_scatter_counts_u4_indptr_{suffix}{b2suf}"
                )
                fn4.restype = ctypes.c_int64
                fn4.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(b2ctype),
                    ctypes.POINTER(ctype),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                ]
        lib.remove_neighbours.restype = None
        lib.remove_neighbours.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.marginal_sums.restype = None
        lib.marginal_sums.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.marginal_sums_i32.restype = None
        lib.marginal_sums_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ice_iterate.restype = ctypes.c_int64
        lib.ice_iterate.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        for b2suf, b2ctype in (
            ("", ctypes.c_int64),
            ("_b2i32", ctypes.c_int32),
        ):
            for csuf, cctype in (
                ("i32", ctypes.c_int32),
                ("i64", ctypes.c_int64),
                ("f64", ctypes.c_double),
            ):
                fnp = getattr(lib, f"ice_prep_csr_{csuf}{b2suf}")
                fnp.restype = ctypes.c_int64
                fnp.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(b2ctype),
                    ctypes.POINTER(cctype),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_uint16),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_int64),
                ]
        lib.ice_iterate_csr.restype = ctypes.c_int64
        lib.ice_iterate_csr.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        for b2suf, b2ct in (("", ctypes.c_int64), ("_b2i32", ctypes.c_int32)):
            fno = getattr(lib, f"trans_range_offsets{b2suf}")
            fno.restype = ctypes.c_int64
            fno.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(b2ct),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            for csuf, cct in (
                ("i32", ctypes.c_int32),
                ("i64", ctypes.c_int64),
                ("f32", ctypes.c_float),
                ("f64", ctypes.c_double),
            ):
                fnf = getattr(lib, f"trans_fill_{csuf}{b2suf}")
                fnf.restype = None
                fnf.argtypes = [
                    ctypes.POINTER(b2ct),
                    ctypes.POINTER(cct),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_float),
                ]
        _LIB = lib
    except Exception as exc:  # toolchain missing, build failure, ...
        sys.stderr.write(f"chromosight-tpu: native build unavailable ({exc})\n")
        _LIB = None
    # Publish the flag only after _LIB is final: the unlocked fast path
    # in get_lib() reads (_TRIED, _LIB) without the lock.
    _TRIED = True
    return _LIB


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _b2_native(b2):
    """(contiguous b2, export-name suffix): int32-stored bin2 ids run
    through the ``_b2i32`` kernels in their stored dtype — casting a
    genome's pixel table to int64 is a multi-second sweep on slow hosts."""
    b2 = np.ascontiguousarray(b2)
    if b2.dtype == np.int32:
        return b2, "_b2i32"
    return np.ascontiguousarray(b2, dtype=np.int64), ""


def _b2p(b2):
    ct = ctypes.c_int32 if b2.dtype == np.int32 else ctypes.c_int64
    return b2.ctypes.data_as(ctypes.POINTER(ct))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def cc_label(rows, cols, ncols):
    """Union-find CC labels (min pixel index per component) or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    labels = np.empty(len(rows), dtype=np.int64)
    lib.cc_label(
        _i64p(rows), _i64p(cols), len(rows), int(ncols), _i64p(labels)
    )
    return labels


def coo_to_band(rows, cols, vals, n, width, dtype=np.float64):
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    if dtype == np.float32:
        vals = np.ascontiguousarray(vals, dtype=np.float32)
        band = np.empty((int(n), int(width)), dtype=np.float32)
        lib.coo_to_band_f32(
            _i64p(rows),
            _i64p(cols),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(rows),
            int(n),
            int(width),
            band.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return band
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    band = np.empty((int(n), int(width)), dtype=np.float64)
    lib.coo_to_band_f64(
        _i64p(rows),
        _i64p(cols),
        _f64p(vals),
        len(rows),
        int(n),
        int(width),
        _f64p(band),
    )
    return band


def band_scatter_fused(b1, b2, counts, weights, s, e, width, n_rows=None):
    """Filter + balance + scatter raw pixel-slice arrays into an upper
    band tensor in one native pass, or None if unavailable.

    ``b1``/``b2`` are *global* bin ids (any integer dtype), ``counts`` the
    raw values, ``weights`` the full per-bin weight vector or None for raw
    mode.  Returns a float32 (n_rows, width) band (``n_rows`` defaults to
    e-s; larger values add zero shape-bucket padding rows).
    """
    lib = get_lib()
    if lib is None:
        return None
    if n_rows is None:
        n_rows = int(e) - int(s)
    b1 = np.ascontiguousarray(b1, dtype=np.int64)
    b2 = np.ascontiguousarray(b2, dtype=np.int64)
    counts = np.ascontiguousarray(counts)
    if counts.dtype == np.float64:
        fn, cptr = lib.band_scatter_fused_f64, ctypes.c_double
    elif counts.dtype == np.int32:
        fn, cptr = lib.band_scatter_fused_i32, ctypes.c_int32
    elif counts.dtype == np.int64:
        fn, cptr = lib.band_scatter_fused_i64, ctypes.c_int64
    else:
        counts = np.ascontiguousarray(counts, dtype=np.float64)
        fn, cptr = lib.band_scatter_fused_f64, ctypes.c_double
    if weights is not None:
        weights = np.ascontiguousarray(weights, dtype=np.float64)
        wp = _f64p(weights)
    else:
        wp = ctypes.POINTER(ctypes.c_double)()
    band = np.empty((int(n_rows), int(width)), dtype=np.float32)
    fn(
        _i64p(b1),
        _i64p(b2),
        counts.ctypes.data_as(ctypes.POINTER(cptr)),
        len(b1),
        wp,
        int(s),
        int(e),
        int(width),
        int(n_rows),
        band.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return band


def band_scatter_counts(b1, b2, counts, s, e, width, n_rows=None):
    """Scatter RAW integer counts into a uint16 (n_rows, width) band —
    half the upload bytes of the balanced f32 band, with exact values
    (the device applies weights and casts, see
    ``ops.band.band_weighted_finalize``).

    Returns None when the native library is unavailable, the count dtype
    is not integral, or any kept pixel overflows uint16 (callers fall
    back to the f32 ``band_scatter_fused`` path).
    """
    lib = get_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts)
    if counts.dtype == np.int32:
        fn, cptr = lib.band_scatter_counts_i32, ctypes.c_int32
    elif counts.dtype == np.int64:
        fn, cptr = lib.band_scatter_counts_i64, ctypes.c_int64
    elif counts.dtype in (np.float64, np.float32):
        # float-stored count tables: the kernel verifies integrality
        counts = np.ascontiguousarray(counts, dtype=np.float64)
        fn, cptr = lib.band_scatter_counts_f64, ctypes.c_double
    else:
        return None
    if n_rows is None:
        n_rows = int(e) - int(s)
    b1 = np.ascontiguousarray(b1, dtype=np.int64)
    b2 = np.ascontiguousarray(b2, dtype=np.int64)
    band = np.empty((int(n_rows), int(width)), dtype=np.uint16)
    overflow = fn(
        _i64p(b1),
        _i64p(b2),
        counts.ctypes.data_as(ctypes.POINTER(cptr)),
        len(b1),
        int(s),
        int(e),
        int(width),
        int(n_rows),
        band.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if overflow:
        return None
    return band


def band_scatter_counts_u8_indptr(
    indptr, b2, counts, s, e, width, n_rows=None, exc_cap=None
):
    """Indptr-driven uint8 + exceptions count scatter: the band ships as
    1-byte pixels (half the uint16 path again) plus a short (flat index,
    value) exception list for counts > 255, so values stay exact.
    Returns ``(band_u8, exc_idx, exc_val)`` or None when the native tier
    is unavailable, a value is non-integral / negative / > 2^24, or the
    exception list would not be worth the bytes (caller falls back to
    the uint16 path)."""
    lib = get_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts)
    b2, b2suf = _b2_native(b2)
    if counts.dtype == np.int32:
        csuf, cptr = "i32", ctypes.c_int32
    elif counts.dtype == np.int64:
        csuf, cptr = "i64", ctypes.c_int64
    elif counts.dtype in (np.float64, np.float32):
        counts = np.ascontiguousarray(counts, dtype=np.float64)
        csuf, cptr = "f64", ctypes.c_double
    else:
        return None
    fn = getattr(lib, f"band_scatter_counts_u8_indptr_{csuf}{b2suf}")
    if n_rows is None:
        n_rows = int(e) - int(s)
    if int(n_rows) * int(width) >= 1 << 31:
        return None  # exception flat indices upload as int32
    if exc_cap is None:
        # u8 + 8-byte exceptions beat the u16 band only while
        # n_exc * 8 < n_rows * width; past that the caller should ship
        # uint16 anyway.
        exc_cap = max(1024, (int(n_rows) * int(width)) // 8)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    n_rows_src = len(indptr) - 1
    band = np.empty((int(n_rows), int(width)), dtype=np.uint8)
    exc_idx = np.empty(int(exc_cap), dtype=np.int64)
    exc_val = np.empty(int(exc_cap), dtype=np.float32)
    n_exc = fn(
        _i64p(indptr),
        _b2p(b2),
        counts.ctypes.data_as(ctypes.POINTER(cptr)),
        n_rows_src,
        int(s),
        int(e),
        int(width),
        int(n_rows),
        band.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i64p(exc_idx),
        exc_val.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(exc_cap),
    )
    if n_exc < 0 or n_exc > exc_cap:
        return None
    return band, exc_idx[:n_exc], exc_val[:n_exc]


def band_scatter_counts_u4_indptr(
    indptr, b2, counts, s, e, width, d0, n_rows=None, exc_cap=None
):
    """Split uint8-head / packed-uint4-tail count scatter: columns
    ``[0, d0)`` (near-diagonal, large Poisson means) ship as 1-byte
    pixels and columns ``[d0, width)`` pack two 4-bit counts per byte —
    about half the u8 path's bytes again for wide scan bands.  Counts
    that do not fit their lane (head > 255, tail > 15) ride a (flat
    UNPACKED-band index, value) exception list, so values stay exact.
    Returns ``(head_u8, tail_packed_u8, exc_idx, exc_val)`` or None when
    the native tier is unavailable, a value is non-integral / negative /
    > 2^24, or the exception list outgrows the bytes the packing saves
    (caller falls back to the u8 path)."""
    lib = get_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts)
    b2, b2suf = _b2_native(b2)
    if counts.dtype == np.int32:
        csuf, cptr = "i32", ctypes.c_int32
    elif counts.dtype == np.int64:
        csuf, cptr = "i64", ctypes.c_int64
    elif counts.dtype in (np.float64, np.float32):
        counts = np.ascontiguousarray(counts, dtype=np.float64)
        csuf, cptr = "f64", ctypes.c_double
    else:
        return None
    fn = getattr(lib, f"band_scatter_counts_u4_indptr_{csuf}{b2suf}")
    if n_rows is None:
        n_rows = int(e) - int(s)
    d0 = int(min(d0, width))
    if int(n_rows) * int(width) >= 1 << 31:
        return None  # exception flat indices upload as int32
    tp = (int(width) - d0 + 1) // 2
    if exc_cap is None:
        # the nibble pack saves n_rows * (width - d0) / 2 bytes over u8;
        # exceptions cost 8 bytes each on the link, so past saved/8 of
        # them the caller should ship u8 anyway.
        exc_cap = max(1024, (int(n_rows) * (int(width) - d0)) // 16)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    n_rows_src = len(indptr) - 1
    head = np.empty((int(n_rows), d0), dtype=np.uint8)
    tail = np.empty((int(n_rows), tp), dtype=np.uint8)
    exc_idx = np.empty(int(exc_cap), dtype=np.int64)
    exc_val = np.empty(int(exc_cap), dtype=np.float32)
    n_exc = fn(
        _i64p(indptr),
        _b2p(b2),
        counts.ctypes.data_as(ctypes.POINTER(cptr)),
        n_rows_src,
        int(s),
        int(e),
        int(width),
        d0,
        int(n_rows),
        head.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i64p(exc_idx),
        exc_val.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(exc_cap),
    )
    if n_exc < 0 or n_exc > exc_cap:
        return None
    return head, tail, exc_idx[:n_exc], exc_val[:n_exc]


def band_scatter_counts_indptr(indptr, b2, counts, s, e, width, n_rows=None):
    """Indptr-driven :func:`band_scatter_counts`: bin1 ids are implied by
    the cool file's per-row pixel offsets (``indptr[r]..indptr[r+1]`` are
    row ``s+r``'s pixels, absolute into the pixel table), so the bin1_id
    dataset is never read or materialised.  Same None-on-fallback
    contract.
    """
    lib = get_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts)
    b2, b2suf = _b2_native(b2)
    if counts.dtype == np.int32:
        csuf, cptr = "i32", ctypes.c_int32
    elif counts.dtype == np.int64:
        csuf, cptr = "i64", ctypes.c_int64
    elif counts.dtype in (np.float64, np.float32):
        counts = np.ascontiguousarray(counts, dtype=np.float64)
        csuf, cptr = "f64", ctypes.c_double
    else:
        return None
    fn = getattr(lib, f"band_scatter_counts_indptr_{csuf}{b2suf}")
    if n_rows is None:
        n_rows = int(e) - int(s)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    n_rows_src = len(indptr) - 1
    band = np.empty((int(n_rows), int(width)), dtype=np.uint16)
    overflow = fn(
        _i64p(indptr),
        _b2p(b2),
        counts.ctypes.data_as(ctypes.POINTER(cptr)),
        n_rows_src,
        int(s),
        int(e),
        int(width),
        int(n_rows),
        band.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if overflow:
        return None
    return band


def trans_coo_balanced(indptr, b2, counts, s2, e2, w1=None, w2=None):
    """Stored-dtype trans rectangle fetch (see kernels.cpp
    ``trans_range_offsets`` / ``trans_fill_*``).

    ``indptr`` is the absolute ``bin1_offset[s1 : e1 + 1]`` slice; ``b2``
    and ``counts`` the matching pixel-table slices in their STORED
    dtypes.  Each row's kept column range [s2, e2) is located with two
    binary searches (cooler sort invariant), then exact-sized
    ``(rows_i32, cols_i32, vals_f32)`` local-coordinate triplets are
    filled in one parallel pass, applying the ``w1[r] * w2[j]``
    balancing product (f64 weights, f64 accumulate, f32 store; NaN
    weights propagate).  Returns None when the native library is
    unavailable (callers fall back to the generic python fetch).
    """
    lib = get_lib()
    if lib is None:
        return None
    b2, b2suf = _b2_native(b2)
    counts = np.ascontiguousarray(counts)
    suffixes = {
        np.dtype(np.int32): ("i32", ctypes.c_int32),
        np.dtype(np.int64): ("i64", ctypes.c_int64),
        np.dtype(np.float32): ("f32", ctypes.c_float),
        np.dtype(np.float64): ("f64", ctypes.c_double),
    }
    if counts.dtype not in suffixes:
        return None
    csuf, cptr = suffixes[counts.dtype]
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    n_rows = len(indptr) - 1
    offsets = np.empty(n_rows + 1, dtype=np.int64)
    klo = np.empty(max(n_rows, 1), dtype=np.int64)
    total = getattr(lib, f"trans_range_offsets{b2suf}")(
        _i64p(indptr),
        _b2p(b2),
        n_rows,
        int(s2),
        int(e2),
        _i64p(offsets),
        _i64p(klo),
    )
    rows = np.empty(total, dtype=np.int32)
    cols = np.empty(total, dtype=np.int32)
    vals = np.empty(total, dtype=np.float32)
    if (w1 is None) != (w2 is None):
        raise ValueError("w1 and w2 must be supplied together")
    if w1 is not None:
        w1 = np.ascontiguousarray(w1, dtype=np.float64)
        w2 = np.ascontiguousarray(w2, dtype=np.float64)
        w1p, w2p = _f64p(w1), _f64p(w2)
    else:
        w1p = w2p = ctypes.POINTER(ctypes.c_double)()
    if total:
        getattr(lib, f"trans_fill_{csuf}{b2suf}")(
            _b2p(b2),
            counts.ctypes.data_as(ctypes.POINTER(cptr)),
            _i64p(offsets),
            _i64p(klo),
            n_rows,
            int(s2),
            w1p,
            w2p,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    return rows, cols, vals


def remove_neighbours(bin1, bin2, score, win_size):
    """Grid-hashed greedy neighbour suppression; bool keep mask in the
    original row order, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    bin1 = np.ascontiguousarray(bin1, dtype=np.int64)
    bin2 = np.ascontiguousarray(bin2, dtype=np.int64)
    score = np.ascontiguousarray(score, dtype=np.float64)
    keep = np.empty(len(bin1), dtype=np.uint8)
    lib.remove_neighbours(
        _i64p(bin1),
        _i64p(bin2),
        _f64p(score),
        len(bin1),
        int(win_size),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)


def ice_iterate(b1, b2, counts, bias, max_iters, tol):
    """Run the whole ICE iteration loop natively with cache-blocked
    marginals (one stable counting sort by column block, then every
    iteration's two random streams stay in ~L2).  Requires compact
    triplets (int32 ids, float32 counts).  Updates ``bias`` IN PLACE
    (0 = excluded) and returns ``(scale, var, n_iters)``, or None when
    the native library is unavailable or the triplets are not compact —
    callers then run the per-iteration loop via ``marginal_sums``."""
    lib = get_lib()
    if lib is None:
        return None
    if not (
        b1.dtype == np.int32
        and b2.dtype == np.int32
        and counts.dtype == np.float32
    ):
        return None
    b1 = np.ascontiguousarray(b1)
    b2 = np.ascontiguousarray(b2)
    counts = np.ascontiguousarray(counts)
    assert bias.dtype == np.float64 and bias.flags.c_contiguous
    scale = ctypes.c_double(float("nan"))
    var = ctypes.c_double(float("inf"))
    n_iters = lib.ice_iterate(
        b1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(b1),
        len(bias),
        _f64p(bias),
        int(max_iters),
        float(tol),
        ctypes.byref(scale),
        ctypes.byref(var),
    )
    return scale.value, var.value, int(n_iters)


def ice_iterate_csr(b1, b2, counts, bias, max_iters, tol):
    """ICE iteration loop over a compressed pixel stream: 3 B/pixel
    (CSR indptr + uint16 diagonal offsets + uint8 counts with an
    exception list) instead of 12 B/pixel triplets — the loop is
    stream-bandwidth-bound, so the compression is the speedup.

    Requires compact triplets sorted by (b1, b2) with every diagonal
    offset < 65536 (cis blocks at scan resolutions).  Updates ``bias``
    in place; returns (scale, var, n_iters) or None when ineligible.
    """
    lib = get_lib()
    if lib is None:
        return None
    if not (
        b1.dtype == np.int32
        and b2.dtype == np.int32
        and counts.dtype == np.float32
    ):
        return None
    n_bins = len(bias)
    if len(b1) == 0:
        return None
    d = b2 - b1  # int32; rows are local so this never overflows
    if d.min() < 0 or d.max() >= 65536:
        return None
    if not np.all(np.diff(b1) >= 0):  # indptr requires row-sorted pixels
        return None
    # counts must be non-negative integers to pack exactly into u8
    small = (counts < 256) & (counts >= 0) & (counts == np.floor(counts))
    ct8 = np.where(small, counts, 0).astype(np.uint8)
    exc = np.flatnonzero(~small)
    exc_i = b1[exc].astype(np.int32, copy=False)
    exc_j = b2[exc].astype(np.int32, copy=False)
    exc_val = counts[exc].astype(np.float32, copy=False)
    indptr = np.zeros(n_bins + 1, dtype=np.int64)
    np.cumsum(np.bincount(b1, minlength=n_bins), out=indptr[1:])
    d16 = d.astype(np.uint16)
    assert bias.dtype == np.float64 and bias.flags.c_contiguous
    scale = ctypes.c_double(float("nan"))
    var = ctypes.c_double(float("inf"))
    n_iters = lib.ice_iterate_csr(
        _i64p(indptr),
        d16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ct8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.ascontiguousarray(exc_i).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        ),
        np.ascontiguousarray(exc_j).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        ),
        np.ascontiguousarray(exc_val).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)
        ),
        len(exc),
        n_bins,
        _f64p(bias),
        int(max_iters),
        float(tol),
        ctypes.byref(scale),
        ctypes.byref(var),
    )
    return scale.value, var.value, int(n_iters)


def ice_prep_csr(indptr, b2, ct, s, e, ignore_diags):
    """One native pass over a cis block's raw pixel-table slice: emits
    the 3 B/pixel compressed stream ``ice_iterate_csr_prebuilt``
    consumes (local-row indptr + uint16 diagonal offsets + uint8 counts
    + (i, j, value) exceptions) plus the nnz / raw-marginal vectors the
    min_nnz and MAD-max filters need.  ``b2``/``ct`` stay in their
    STORED dtypes (int32 cool ids run cast-free) and bin1 is implied by
    the file's CSR ``bin1_offset`` slice ``indptr``.

    Returns ``(indptr_out, d16, ct8, exc_i, exc_j, exc_val, nnz, marg)``
    or None when the native tier is unavailable, a count is negative /
    not exactly f32-representable, or the block is taller than the u16
    diagonal stream supports (callers fall back to the numpy path).
    """
    lib = get_lib()
    if lib is None:
        return None
    ct = np.ascontiguousarray(ct)
    b2, b2suf = _b2_native(b2)
    if ct.dtype == np.int32:
        csuf = "i32"
    elif ct.dtype == np.int64:
        csuf = "i64"
    elif ct.dtype in (np.float64, np.float32):
        ct = np.ascontiguousarray(ct, dtype=np.float64)
        csuf = "f64"
    else:
        return None
    fn = getattr(lib, f"ice_prep_csr_{csuf}{b2suf}")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    n = len(indptr) - 1
    if n >= 2**31:
        return None  # exception ids upload as int32
    cap = len(b2)
    indptr_out = np.empty(n + 1, dtype=np.int64)
    d16 = np.empty(cap, dtype=np.uint16)
    ct8 = np.empty(cap, dtype=np.uint8)
    nnz = np.empty(n, dtype=np.int64)
    marg = np.empty(n, dtype=np.float64)
    n_exc_out = ctypes.c_int64(0)
    exc_cap = max(4096, cap // 16)
    for _ in range(2):
        exc_i = np.empty(int(exc_cap), dtype=np.int32)
        exc_j = np.empty(int(exc_cap), dtype=np.int32)
        exc_val = np.empty(int(exc_cap), dtype=np.float32)
        m = fn(
            _i64p(indptr),
            _b2p(b2),
            ct.ctypes.data_as(
                ctypes.POINTER(
                    {"i32": ctypes.c_int32, "i64": ctypes.c_int64,
                     "f64": ctypes.c_double}[csuf]
                )
            ),
            n,
            int(s),
            int(e),
            int(ignore_diags),
            _i64p(indptr_out),
            d16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ct8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            exc_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            exc_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            exc_val.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(exc_cap),
            _i64p(nnz),
            _f64p(marg),
            ctypes.byref(n_exc_out),
        )
        if m == -3:  # exception list overflowed: exact retry, in-memory
            exc_cap = int(n_exc_out.value)
            continue
        break
    if m < 0:
        return None
    ne = int(n_exc_out.value)
    return (
        indptr_out,
        d16[:m].copy(),
        ct8[:m].copy(),
        exc_i[:ne],
        exc_j[:ne],
        exc_val[:ne],
        nnz,
        marg,
    )


def ice_iterate_csr_prebuilt(
    indptr, d16, ct8, exc_i, exc_j, exc_val, bias, max_iters, tol
):
    """Run the compressed-stream ICE loop on a prebuilt stream (from
    :func:`ice_prep_csr`).  Updates ``bias`` in place; returns
    ``(scale, var, n_iters)`` or None when the native tier is missing."""
    lib = get_lib()
    if lib is None:
        return None
    assert bias.dtype == np.float64 and bias.flags.c_contiguous
    scale = ctypes.c_double(float("nan"))
    var = ctypes.c_double(float("inf"))
    n_iters = lib.ice_iterate_csr(
        _i64p(np.ascontiguousarray(indptr, dtype=np.int64)),
        np.ascontiguousarray(d16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16)
        ),
        np.ascontiguousarray(ct8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        np.ascontiguousarray(exc_i).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        ),
        np.ascontiguousarray(exc_j).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        ),
        np.ascontiguousarray(exc_val).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)
        ),
        len(exc_i),
        len(bias),
        _f64p(bias),
        int(max_iters),
        float(tol),
        ctypes.byref(scale),
        ctypes.byref(var),
    )
    return scale.value, var.value, int(n_iters)


def marginal_sums(b1, b2, counts, bias, n_bins):
    """Marginals of the symmetric matrix from upper-triangle triplets.

    When the caller hands in compact triplets (int32 ids + float32
    counts, the memory-bound ICE iteration's layout) the half-bandwidth
    i32 kernel runs; products are computed in double either way, so both
    entry points return bitwise-identical marginals."""
    lib = get_lib()
    if lib is None:
        return None
    bias = np.ascontiguousarray(bias, dtype=np.float64)
    marg = np.empty(int(n_bins), dtype=np.float64)
    if (
        b1.dtype == np.int32
        and b2.dtype == np.int32
        and counts.dtype == np.float32
    ):
        b1 = np.ascontiguousarray(b1)
        b2 = np.ascontiguousarray(b2)
        counts = np.ascontiguousarray(counts)
        lib.marginal_sums_i32(
            b1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _f64p(bias),
            len(b1),
            int(n_bins),
            _f64p(marg),
        )
        return marg
    b1 = np.ascontiguousarray(b1, dtype=np.int64)
    b2 = np.ascontiguousarray(b2, dtype=np.int64)
    counts = np.ascontiguousarray(counts, dtype=np.float64)
    lib.marginal_sums(
        _i64p(b1),
        _i64p(b2),
        _f64p(counts),
        _f64p(bias),
        len(b1),
        int(n_bins),
        _f64p(marg),
    )
    return marg
