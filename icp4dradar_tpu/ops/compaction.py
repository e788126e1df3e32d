"""Masked compaction: gather valid entries to the front of a fixed-size
buffer — the static-shape replacement for the reference's dynamic
`push_back` accumulation (e.g. submap assembly
src/iterative_closest_point.cpp:577-633, sector query output
third_party/ikd-Tree/ikd_Tree.cpp:1024-1140)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def mask_compact(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    out_size: int,
    fill: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter `values[mask]` into the first slots of a (out_size, ...) buffer.

    values: (N, ...); mask: (N,) in {0,1}. Entries beyond out_size are
    dropped (callers should size out_size generously and check `count`).

    Returns (out (out_size, ...), out_mask (out_size,), count ()).
    """
    maskb = mask > 0.5
    pos = jnp.cumsum(maskb.astype(jnp.int32)) - 1          # destination slot
    count = jnp.sum(maskb.astype(jnp.int32))
    dest = jnp.where(maskb & (pos < out_size), pos, out_size)  # overflow bin
    if values.ndim == 2 and fill == 0.0:
        # fold the mask into the scatter payload: scatters have a high fixed
        # cost on TPU, one op instead of two
        aug = jnp.concatenate(
            [values, jnp.ones((values.shape[0], 1), values.dtype)], axis=-1)
        out = jnp.zeros((out_size + 1, aug.shape[1]), values.dtype)
        out = out.at[dest].set(aug)
        return (out[:out_size, :-1], out[:out_size, -1],
                jnp.minimum(count, out_size))
    out_shape = (out_size + 1,) + values.shape[1:]
    out = jnp.full(out_shape, fill, dtype=values.dtype).at[dest].set(values)
    out_mask = jnp.zeros(out_size + 1, dtype=values.dtype).at[dest].set(1.0)
    return out[:out_size], out_mask[:out_size], jnp.minimum(count, out_size)
