"""Device-side (JAX/XLA/Pallas) compute primitives.

Everything in this subpackage is pure-functional, static-shape JAX code
designed to be `jit`-compiled once per (bucketed shape, kernel shape,
config) combination and sharded over a device mesh.
"""
