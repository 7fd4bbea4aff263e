"""ST-k bounded-context sort transform (Schindler transform).

libbsc's GPU block sorter (`st2.cu:292-432`: pack following k chars
into fixed-width keys, one radix sort, emit preceding chars) — the
TPU-friendliest BWT variant: ONE `lax.sort` with packed keys, no
doubling loop.

Forward (device): key = next k bytes (cyclic) packed into two uint32;
stable sort with position tiebreak; output last column + index of
rotation 0 — nothing else is stored.

Inverse (device + native C): the context string of every output slot
is reconstructed on device with the classic prepend-sort identity
(ctx_t = ctx_1 gathered through powers of the stable sort-by-L
permutation — k-1 gathers), then a serial backward walk assigns
predecessors: a slot's PREDECESSOR context (L[j] + first k-1 context
chars) is fully known, equal-full-context slots are position-ordered,
and the walk visits positions in decreasing order, so consuming each
context group from its end is exact.  The walk is the native C stage
`st_gold_inverse` (the successor relation is not a static permutation,
which is exactly why bsc's inverse ST is CPU-side and bucket-based,
`st.cpp:1029+`).
"""

from __future__ import annotations

from functools import partial

import ctypes

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def st_encode(data: jax.Array, k: int = 8):
    """ST-k of uint8[n] -> (last uint8[n], idx0 int32)."""
    n = data.shape[0]
    b = data.astype(jnp.uint32)
    hi = jnp.zeros((n,), jnp.uint32)
    lo = jnp.zeros((n,), jnp.uint32)
    for t in range(min(k, 4)):
        hi = (hi << 8) | jnp.roll(b, -t)
    for t in range(4, k):
        lo = (lo << 8) | jnp.roll(b, -t)
    if k < 4:
        hi = hi << (8 * (4 - k))
    if 4 < k < 8:
        lo = lo << (8 * (8 - k))  # keys are left-aligned in 64 bits
    idx = jnp.arange(n, dtype=jnp.int32)
    _, _, order = jax.lax.sort((hi, lo, idx), num_keys=2, is_stable=True)
    last = data[(order - 1) % n]
    idx0 = jnp.argmax(order == 0).astype(jnp.int32)
    return last, idx0


@partial(jax.jit, static_argnames=("k",))
def st_context_keys(last: jax.Array, k: int = 8):
    """Reconstruct each slot's k-byte context on device.

    ctx char t of slot j equals ctx char t-1 of slot P[j], where P is
    the stable sort-by-L permutation; ctx char 0 is the sorted multiset
    of L.  Returns (hi uint32[n], lo uint32[n]) packed context keys
    (zero-padded low bytes when k < 8).
    """
    n = last.shape[0]
    sym = last.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    s_sorted, P = jax.lax.sort((sym, idx), num_keys=1, is_stable=True)
    chars = [s_sorted.astype(jnp.uint32)]  # ctx char 0 per slot
    cur = s_sorted.astype(jnp.uint32)
    for _ in range(k - 1):
        cur = cur[P]  # ctx char t of slot j = ctx char t-1 of P[j]
        chars.append(cur)
    hi = jnp.zeros((n,), jnp.uint32)
    lo = jnp.zeros((n,), jnp.uint32)
    for t in range(min(k, 4)):
        hi = (hi << 8) | chars[t]
    for t in range(4, k):
        lo = (lo << 8) | chars[t]
    if k < 4:
        hi = hi << (8 * (4 - k))
    if 4 < k < 8:
        lo = lo << (8 * (8 - k))
    return hi, lo


@partial(jax.jit, static_argnames=("k",))
def st_encode_masked(data: jax.Array, n: jax.Array, k: int = 8):
    """ST-k of the first n bytes of uint8[cap] -> (last uint8[cap]
    valid prefix n, idx0 int32).

    Fixed compiled shape at traced valid length (same scheme as
    `masked.bwt_encode_masked`): cyclic k-byte keys come from wrap
    slices of a doubled buffer, padding rows sort after every real row
    and never move.  ONE stable sort total — the reason ST-k is the
    TPU-friendly sorter for 25 MB bsc blocks (`st2.cu:292-432` is the
    same shape: presort key pack, one radix sort, postsort).
    """
    from tpulc.codecs.bwt.masked import _doubled, _wrap_slice

    cap = data.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    real = idx < n
    nn = jnp.maximum(n, 1)
    d2 = _doubled(data.astype(jnp.uint32), nn, 0)
    bs = [data.astype(jnp.uint32)] + [
        _wrap_slice(d2, jnp.int32(t) % nn, cap) for t in range(1, k)
    ]
    hi = jnp.zeros((cap,), jnp.uint32)
    lo = jnp.zeros((cap,), jnp.uint32)
    for t in range(min(k, 4)):
        hi = (hi << 8) | bs[t]
    for t in range(4, k):
        lo = (lo << 8) | bs[t]
    if k < 4:
        hi = hi << (8 * (4 - k))
    if 4 < k < 8:
        lo = lo << (8 * (8 - k))  # keys are left-aligned in 64 bits
    prim = jnp.where(real, 0, 1)
    hi = jnp.where(real, hi, idx.astype(jnp.uint32))
    lo = jnp.where(real, lo, 0)
    d2u8 = _doubled(data, nn, jnp.uint8(0))
    prev = _wrap_slice(d2u8, (nn - 1) % nn, cap)  # prev[i]=data[(i-1)%n]
    _, _, _, order, last = jax.lax.sort(
        (prim, hi, lo, idx, prev), num_keys=4, is_stable=True
    )
    last = jnp.where(real, last, 0).astype(jnp.uint8)
    idx0 = jnp.argmax((order == 0) & real).astype(jnp.int32)
    return last, idx0


@partial(jax.jit, static_argnames=("k",))
def st_context_keys_masked(last: jax.Array, n: jax.Array, k: int = 8):
    """`st_context_keys` over the valid prefix n of uint8[cap].

    Pad rows sort after every real symbol and self-compose harmlessly;
    only rows < n of the returned keys are meaningful.
    """
    cap = last.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    real = idx < n
    sym = jnp.where(real, last.astype(jnp.int32), 256 + idx)
    s_sorted, P = jax.lax.sort((sym, idx), num_keys=1, is_stable=True)
    chars = [jnp.minimum(s_sorted, 255).astype(jnp.uint32)]
    cur = chars[0]
    for _ in range(k - 1):
        cur = cur[P]
        chars.append(cur)
    hi = jnp.zeros((cap,), jnp.uint32)
    lo = jnp.zeros((cap,), jnp.uint32)
    for t in range(min(k, 4)):
        hi = (hi << 8) | chars[t]
    for t in range(4, k):
        lo = (lo << 8) | chars[t]
    if k < 4:
        hi = hi << (8 * (4 - k))
    if 4 < k < 8:
        lo = lo << (8 * (8 - k))
    return hi, lo


def st_decode(last: np.ndarray, idx0: int, k: int = 8) -> np.ndarray:
    """Inverse ST-k: device context reconstruction + native C walk."""
    from tpulc.gold.lzss_gold import _load, _as_buf

    n = len(last)
    hi, lo = st_context_keys(jnp.asarray(last), k)
    hi = np.ascontiguousarray(np.asarray(hi), np.uint32)
    lo = np.ascontiguousarray(np.asarray(lo), np.uint32)
    lastc = np.ascontiguousarray(last, np.uint8)
    out = np.zeros(n, np.uint8)
    lib = _load()
    fn = lib.st_gold_inverse
    if not getattr(fn, "_configured", False):
        fn.restype = ctypes.c_long
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_long, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        fn._configured = True
    r = fn(
        _as_buf(lastc), n,
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        int(idx0), k, _as_buf(out),
    )
    if r < 0:
        raise ValueError("inverse ST failed")
    return out


def st_encode_np(data, k: int = 8):
    """Naive gold: sort positions by following-k-gram (cyclic), stable."""
    arr = np.asarray(data, np.uint8)
    n = len(arr)
    doubled = np.concatenate([arr, arr])
    keys = [tuple(doubled[i: i + k]) for i in range(n)]
    order = sorted(range(n), key=lambda i: (keys[i], i))
    last = np.array([arr[(i - 1) % n] for i in order], np.uint8)
    return last, order.index(0)
