"""Preprocessing filters (libbsc's `libbsc/filters/` family).

- record reorder: transpose fixed-width records (AoS -> SoA) so
  same-field bytes cluster before the block sorter
  (`bsc_reorder_forward`).
- block reverse: reverse the block (`bsc_reverse_block`).
- segmentation detector: entropy-based split suggestion
  (`bsc_detect_segments`, `detectors.cpp:70-290`): scan windowed byte
  entropy and propose segment boundaries where the local model shifts.

All trivially invertible; the codec drivers can apply them per block
ahead of the pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("record_size",))
def record_reorder(data: jax.Array, record_size: int) -> jax.Array:
    """AoS->SoA transpose of fixed-size records (tail untouched)."""
    n = data.shape[0]
    body = (n // record_size) * record_size
    main = data[:body].reshape(-1, record_size).T.reshape(-1)
    return jnp.concatenate([main, data[body:]])


@partial(jax.jit, static_argnames=("record_size",))
def record_reorder_inverse(data: jax.Array, record_size: int) -> jax.Array:
    n = data.shape[0]
    body = (n // record_size) * record_size
    main = data[:body].reshape(record_size, -1).T.reshape(-1)
    return jnp.concatenate([main, data[body:]])


def block_reverse(data: jax.Array) -> jax.Array:
    return data[::-1]


def detect_segments(data: np.ndarray, window: int = 1 << 16,
                    threshold: float = 0.35) -> list[int]:
    """Suggest segment boundaries where windowed byte entropy jumps.

    Returns offsets (ascending, excluding 0 and n) where adjacent
    windows' byte distributions diverge by more than `threshold` bits
    of Jensen-Shannon-style distance — a light-weight version of bsc's
    entropy-model detector (`detectors.cpp:70-290`).
    """
    arr = np.asarray(data, np.uint8)
    n = len(arr)
    if n < 2 * window:
        return []
    nwin = n // window
    hists = np.zeros((nwin, 256), np.float64)
    for w in range(nwin):
        hists[w] = np.bincount(
            arr[w * window: (w + 1) * window], minlength=256
        )
    p = hists / window
    bounds = []
    for w in range(1, nwin):
        a, b = p[w - 1], p[w]
        m = (a + b) / 2
        def h(x):
            nz = x[x > 0]
            return -(nz * np.log2(nz)).sum()
        jsd = h(m) - (h(a) + h(b)) / 2
        if jsd > threshold:
            bounds.append(w * window)
    return bounds
