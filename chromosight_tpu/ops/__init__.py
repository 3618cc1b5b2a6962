"""Device-side (JAX/XLA/Pallas) compute primitives.

Everything in this subpackage is pure-functional, static-shape JAX code
designed to be `jit`-compiled once per (bucketed shape, kernel shape,
config) combination and sharded over a device mesh.
"""


def pow2(x, minimum):
    """Round a capacity up to the next power of two, at least ``minimum``.

    The shared bucketing rule for padded device buffers (extraction caps,
    coordinate gathers, COO/exception uploads): every distinct capacity
    is a fresh XLA program, so capacities snap to powers of two with a
    per-use floor.
    """
    return max(minimum, 1 << int(max(int(x) - 1, 1)).bit_length())
