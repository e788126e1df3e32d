"""Nearest-neighbor correspondence kernels.

The ICP inner loop's hot op (reference: PCL kd-tree search inside
`icp.align`, src/iterative_closest_point.cpp:514; ikd-Tree `Nearest_Search`,
third_party/ikd-Tree/ikd_Tree.cpp:368-398). On TPU, brute force beats
pointer-chasing trees for radar-scale clouds (2-16k points): the distance
matrix is one MXU matmul. Two implementations:

- `nearest_neighbor_pallas`: tiled Pallas kernel; the (TS, TM) distance tile
  lives only in VMEM, running min/argmin accumulated across target tiles —
  no HBM round-trip of the full (N, M) matrix.
- `nearest_neighbor_xla`: chunked lax.map fallback (CPU tests, small inputs).

Both honor a target validity mask and return (indices, squared distances).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain numpy scalar: a module-level jnp constant would initialize the JAX
# backends at import time, freezing the device count before CLI entry
# points can pin the platform (run_odometry --cpu / --distributed)
import numpy as _np
_BIG = _np.float32(1e30)


# ----------------------------------------------------------------------
# XLA reference implementation (chunked to bound memory)
# ----------------------------------------------------------------------
def nearest_neighbor_xla(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: Optional[jnp.ndarray] = None,
    chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each src point, index + squared distance of nearest valid tgt point.

    src: (N,3), tgt: (M,3), tgt_mask: (M,) -> ((N,) int32, (N,) f32).
    """
    n = src.shape[0]
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt.shape[0], dtype=src.dtype)
    t2 = jnp.sum(tgt * tgt, axis=-1)
    penalty = jnp.where(tgt_mask > 0.5, 0.0, _BIG)

    pad = (-n) % chunk
    src_p = jnp.pad(src, ((0, pad), (0, 0)))

    def one_chunk(s):
        d2 = (
            jnp.sum(s * s, axis=-1, keepdims=True)
            - 2.0 * s @ tgt.T
            + t2[None, :]
            + penalty[None, :]
        )
        idx = jnp.argmin(d2, axis=-1)
        return idx.astype(jnp.int32), jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]

    idx, d2 = jax.lax.map(one_chunk, src_p.reshape(-1, chunk, 3))
    idx = idx.reshape(-1)[:n]
    d2 = jnp.maximum(d2.reshape(-1)[:n], 0.0)
    return idx, d2


# ----------------------------------------------------------------------
# Pallas TPU kernel
# ----------------------------------------------------------------------
def _nn_kernel(src_ref, tgt_ref, bestd_ref, besti_ref):
    # Layout choices that matter on TPU (measured ~300x vs the naive form):
    # - distances via elementwise broadcasts on the VPU: a K=3 dot_general
    #   wastes the 128x128 MXU at 2% utilization
    # - the distance tile is (TM, TS): reductions run over the SUBLANE axis
    #   (cheap) with per-src-point results along lanes; a lane-axis argmin
    #   is catastrophically slow
    # - argmin as min-of-iota over positions matching the min value
    i = pl.program_id(0)
    j = pl.program_id(1)
    tm = tgt_ref.shape[0]

    s = src_ref[:]                       # (TS, 3)
    t4 = tgt_ref[:]                      # (TM, 4): xyz + mask penalty column
    # penalty column seeds the accumulator (masked targets -> +BIG; one
    # full-tile pass saved vs zeros-init + post-add)
    d2 = jnp.broadcast_to(t4[:, 3][:, None], (tm, s.shape[0]))  # (TM, TS)
    for k in range(3):
        diff = t4[:, k:k + 1] - s[:, k][None, :]
        d2 = d2 + diff * diff

    local_min = jnp.min(d2, axis=0)                          # (TS,)
    rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    local_arg = jnp.min(
        jnp.where(d2 <= local_min[None, :], rows, tm), axis=0
    ) + j * tm

    @pl.when(j == 0)
    def _():
        bestd_ref[i, :] = local_min
        besti_ref[i, :] = local_arg

    @pl.when(j > 0)
    def _():
        prev_d = bestd_ref[i, :]
        better = local_min < prev_d
        bestd_ref[i, :] = jnp.where(better, local_min, prev_d)
        besti_ref[i, :] = jnp.where(better, local_arg, besti_ref[i, :])


@functools.partial(jax.jit, static_argnames=("ts", "tm", "interpret"))
def nearest_neighbor_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: Optional[jnp.ndarray] = None,
    ts: int = 512,
    tm: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled brute-force 1-NN on TPU. Shapes padded to tile multiples."""
    n, m = src.shape[0], tgt.shape[0]
    if tgt_mask is None:
        tgt_mask = jnp.ones(m, dtype=src.dtype)
    ts = min(ts, max(8, n))
    pad_n = (-n) % ts
    pad_m = (-m) % tm
    src_p = jnp.pad(src.astype(jnp.float32), ((0, pad_n), (0, 0)))
    tgt_p = jnp.pad(tgt.astype(jnp.float32), ((0, pad_m), (0, 0)))
    pen = jnp.where(tgt_mask > 0.5, 0.0, _BIG).astype(jnp.float32)
    pen = jnp.pad(pen, (0, pad_m), constant_values=_BIG)

    np_, mp_ = src_p.shape[0], tgt_p.shape[0]
    ns = np_ // ts
    grid = (ns, mp_ // tm)
    # Penalty rides as a 4th target column (last-dim=4 == full dim satisfies
    # the TPU block-shape rule); outputs are (ns, ts) full-array blocks with
    # dynamic row writes — small enough to pin in VMEM for the whole grid.
    tgt4 = jnp.concatenate([tgt_p, pen[:, None]], axis=-1)

    bestd, besti = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ns, ts), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, ts), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, ts), jnp.float32),
            jax.ShapeDtypeStruct((ns, ts), jnp.int32),
        ],
        interpret=interpret,
    )(src_p, tgt4)
    bestd = bestd.reshape(np_)[:n]
    besti = besti.reshape(np_)[:n]
    return besti, jnp.maximum(bestd, 0.0)


def nearest_neighbor(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend dispatch: Pallas on TPU, chunked XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return nearest_neighbor_pallas(src, tgt, tgt_mask)
    return nearest_neighbor_xla(src, tgt, tgt_mask)


# ----------------------------------------------------------------------
# 1-NN + matched coordinates (gather-free correspondence for ICP)
# ----------------------------------------------------------------------
def _nn_coords_kernel(src_ref, tgt_ref, bestd_ref, bestq_ref):
    """Like _nn_kernel but emits the nearest target's coordinates instead of
    its index: a row gather tgt[idx] costs ~0.2 ms/frame on TPU, while
    selecting coordinates inside the tile via the argmin one-hot is three
    extra sublane reductions."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tm = tgt_ref.shape[0]

    s = src_ref[:]                       # (TS, 3)
    t4 = tgt_ref[:]                      # (TM, 4)
    # penalty column seeds the accumulator (one full-tile pass saved)
    d2 = jnp.broadcast_to(t4[:, 3][:, None], (tm, s.shape[0]))
    for k in range(3):
        diff = t4[:, k:k + 1] - s[:, k][None, :]
        d2 = d2 + diff * diff

    local_min = jnp.min(d2, axis=0)                          # (TS,)
    rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    arg_rows = jnp.min(jnp.where(d2 <= local_min[None, :], rows, tm), axis=0)
    onehot = (rows == arg_rows[None, :]).astype(jnp.float32)  # (TM, TS)
    q = jnp.stack(
        [jnp.sum(t4[:, k][:, None] * onehot, axis=0) for k in range(3)],
        axis=0,
    )                                                        # (3, TS)

    @pl.when(j == 0)
    def _():
        bestd_ref[i, :] = local_min
        bestq_ref[i, :, :] = q

    @pl.when(j > 0)
    def _():
        prev_d = bestd_ref[i, :]
        better = local_min < prev_d
        bestd_ref[i, :] = jnp.where(better, local_min, prev_d)
        bestq_ref[i, :, :] = jnp.where(better[None, :], q, bestq_ref[i, :, :])


@functools.partial(jax.jit, static_argnames=("ts", "tm", "interpret"))
def nearest_neighbor_coords_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: Optional[jnp.ndarray] = None,
    ts: int = 512,
    tm: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(squared distances (N,), matched coords (N,3)) without any gather."""
    n, m = src.shape[0], tgt.shape[0]
    if tgt_mask is None:
        tgt_mask = jnp.ones(m, dtype=src.dtype)
    ts = min(ts, max(8, n))
    pad_n = (-n) % ts
    pad_m = (-m) % tm
    src_p = jnp.pad(src.astype(jnp.float32), ((0, pad_n), (0, 0)))
    tgt_p = jnp.pad(tgt.astype(jnp.float32), ((0, pad_m), (0, 0)))
    pen = jnp.where(tgt_mask > 0.5, 0.0, _BIG).astype(jnp.float32)
    pen = jnp.pad(pen, (0, pad_m), constant_values=_BIG)
    tgt4 = jnp.concatenate([tgt_p, pen[:, None]], axis=-1)

    np_, mp_ = src_p.shape[0], tgt_p.shape[0]
    ns = np_ // ts
    bestd, bestq = pl.pallas_call(
        _nn_coords_kernel,
        grid=(ns, mp_ // tm),
        in_specs=[
            pl.BlockSpec((ts, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ns, ts), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 3, ts), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, ts), jnp.float32),
            jax.ShapeDtypeStruct((ns, 3, ts), jnp.float32),
        ],
        interpret=interpret,
    )(src_p, tgt4)
    d2 = jnp.maximum(bestd.reshape(np_)[:n], 0.0)
    coords = jnp.moveaxis(bestq, 1, 2).reshape(np_, 3)[:n]
    return d2, coords


def nearest_neighbor_with_coords(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(d2 (N,), matched tgt coords (N,3)); Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return nearest_neighbor_coords_pallas(src, tgt, tgt_mask)
    idx, d2 = nearest_neighbor_xla(src, tgt, tgt_mask)
    return d2, tgt[idx]


# ----------------------------------------------------------------------
# k-nearest neighbors (GICP covariances / surface normals)
# ----------------------------------------------------------------------
def knn(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    k: int,
    tgt_mask: Optional[jnp.ndarray] = None,
    chunk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest valid tgt points per src point.

    Returns (indices (N,k) int32, squared distances (N,k)). Invalid targets
    get _BIG distance (callers must mask with d2 < threshold when fewer than
    k valid points exist). XLA top_k per chunk; the distance matrix never
    exceeds (chunk, M).
    """
    n = src.shape[0]
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt.shape[0], dtype=src.dtype)
    t2 = jnp.sum(tgt * tgt, axis=-1)
    penalty = jnp.where(tgt_mask > 0.5, 0.0, _BIG)
    pad = (-n) % chunk
    src_p = jnp.pad(src, ((0, pad), (0, 0)))

    def one_chunk(s):
        d2 = (
            jnp.sum(s * s, axis=-1, keepdims=True)
            - 2.0 * s @ tgt.T
            + t2[None, :]
            + penalty[None, :]
        )
        neg_d, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg_d

    idx, d2 = jax.lax.map(one_chunk, src_p.reshape(-1, chunk, 3))
    idx = idx.reshape(-1, k)[:n]
    d2 = jnp.maximum(d2.reshape(-1, k)[:n], 0.0)
    return idx, d2
