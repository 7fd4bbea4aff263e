"""Preprocessing filters (libbsc's `libbsc/filters/` family).

- record reorder: transpose fixed-width records (AoS -> SoA) so
  same-field bytes cluster before the block sorter
  (`bsc_reorder_forward`, `cuda-bsc/libbsc/filters/preprocessing.cpp`).
- block reverse: reverse the block (`bsc_reverse_block`).
- record-size detector: drives the `--filter auto` mode — the tpulc
  counterpart of libbsc's entropy-model detectors
  (`detectors.cpp:70-290`), reduced to the decision the bsc codec
  actually consumes: "is there fixed-stride record structure worth
  transposing?".

The codec applies filters on the host (numpy transposes are memory
moves, not compute) ahead of LZP, records the choice in the per-block
payload flags, and inverts after LZP decode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# filter byte on the wire: 0 = none, 1 = reverse, else reorder with
# record size = the byte value (2..255)
FILTER_NONE = 0
FILTER_REVERSE = 1


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


def apply_filter_np(block: np.ndarray, filter_byte: int) -> np.ndarray:
    """Host-side forward filter (the codec's encode-side stage)."""
    if filter_byte == FILTER_NONE:
        return block
    if filter_byte == FILTER_REVERSE:
        return block[::-1]
    rs = filter_byte
    body = (len(block) // rs) * rs
    return np.concatenate(
        [np.ascontiguousarray(block[:body].reshape(-1, rs).T).reshape(-1),
         block[body:]]
    )


def invert_filter_np(block: np.ndarray, filter_byte: int) -> np.ndarray:
    """Host-side inverse filter (the codec's decode-side stage)."""
    if filter_byte == FILTER_NONE:
        return block
    if filter_byte == FILTER_REVERSE:
        return block[::-1]
    rs = filter_byte
    body = (len(block) // rs) * rs
    return np.concatenate(
        [np.ascontiguousarray(block[:body].reshape(rs, -1).T).reshape(-1),
         block[body:]]
    )


def detect_record_size(block: np.ndarray, max_size: int = 32,
                       sample: int = 1 << 18, margin: float = 1.25,
                       floor: float = 0.10) -> int:
    """Suggest a record size for `--filter auto`, or 0 for none.

    Byte-equality autocorrelation: fixed-width records make
    ``data[i] == data[i - N]`` markedly more likely at the true record
    stride N than at lag 1 (text's baseline self-similarity).  Returns
    the best N in [2, max_size] when its score clears both the lag-1
    baseline by `margin` and an absolute `floor`; harmless on non-record
    data (returns 0, codec stores no filter byte).
    """
    arr = np.asarray(block[:sample], np.uint8)
    n = len(arr)
    if n < 4 * max_size:
        return 0
    base = float((arr[1:] == arr[:-1]).mean())
    best_n, best_s = 0, 0.0
    for N in range(2, max_size + 1):
        s = float((arr[N:] == arr[:-N]).mean())
        if s > best_s:
            best_n, best_s = N, s
    if best_s > max(margin * base, floor):
        return best_n
    return 0
