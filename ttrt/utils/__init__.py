"""Utilities: logging, profiling."""

def count_bits(value):
    """Population count (count_bits, TerminalRayTracer.c:231-237 — dead
    code there, carried for API-surface parity). Works on ints and on
    jnp/np integer arrays."""
    import jax.numpy as jnp

    if isinstance(value, int):
        return bin(value & 0xFFFFFFFF).count("1")
    v = jnp.asarray(value)
    return jnp.bitwise_count(v.astype(jnp.uint32)).astype(jnp.int32)
