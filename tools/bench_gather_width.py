"""Does TPU gather cost scale with element COUNT or BYTES?

If per-element, a complex64 (8-byte) gather moves 2x the bits of a
uint32 gather at the same cost — the huffman decoder could fetch
57-bit windows (4 symbols of <= 12 bits) per gather element instead
of 25-bit windows (2 symbols).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t(f, *a, n=6):
    float(np.asarray(f(*a)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(np.asarray(f(*a)).ravel()[0])  # noqa: F841
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    cal = jax.jit(lambda x: x.sum())
    over = t(cal, jnp.ones((8,), jnp.int32))
    print(f"overhead {over*1e3:.1f} ms")
    N = 8 * (1 << 20)
    tab32 = jnp.asarray(rng.integers(0, 2**31, 2 * N).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, N - 4, N).astype(np.int32))

    f32 = jax.jit(lambda tb, i: tb[i].astype(jnp.int32).sum())
    print(f"u32 gather 8M:  {(t(f32, tab32, idx)-over)*1e3:8.1f} ms")

    # complex64 gathers are UNIMPLEMENTED on this backend (first
    # attempt wedged the device) — only the u32 cases below are viable.
    tabf2 = tab32.reshape(-1, 2)
    ff2 = jax.jit(lambda tb, i: tb[i].astype(jnp.int32).sum())
    print(f"u32x2 row gather 8M: {(t(ff2, tabf2, idx)-over)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
