"""Fused ICP-iteration kernel: transform + NN correspondence + weighted
moment accumulation in ONE Pallas pass.

The speed-of-light formulation of the ICP hot loop (SURVEY.md §7 step 3):
per iteration the only data that leaves the kernel are 24 scalars per source
block — the weighted correspondence moments

    [ sum w,  sum w p,  sum w q,  sum w p q^T,  sum w d2 ]   (17 numbers)

from which the host-side math recovers centroids, the 3x3 cross-covariance,
the Kabsch/Horn rotation, and the PCL-style fitness — all O(1). No (N,3)
intermediate ever round-trips HBM, no gathers, no 3x3 SVD.

Layout notes (v5e):
- source rides transposed (4, TS): x,y,z,mask rows with points along LANES
- target rides (TM, 4): points along SUBLANES so the (TM, TS) distance tile
  broadcasts naturally and min/argmin reduce over sublanes
- the pose rides as a (1, 16) row-major 4x4 in VMEM
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as _np
_BIG = _np.float32(1e30)  # numpy, not jnp: no backend init at import
_NMOM = 24  # 17 used, padded


def _make_icp_moments_kernel(max_d2: float):
    gate = min(float(max_d2) ** 2 if max_d2 < 1e15 else _BIG * 0.5,
               float(_BIG) * 0.5)

    def kernel(T_ref, src_ref, tgt_ref, out_ref):
        i = pl.program_id(0)
        tm = tgt_ref.shape[0]
        ts = src_ref.shape[1]

        Tm = T_ref[0, :]                  # (16,) row-major 4x4
        s4 = src_ref[:]                   # (4, TS): x,y,z,mask
        t5 = tgt_ref[:]                   # (TM, 5): x,y,z,penalty,ones

        # moved source p = R s + t, per coordinate row (lane-parallel)
        p = [
            Tm[4 * r + 0] * s4[0, :] + Tm[4 * r + 1] * s4[1, :]
            + Tm[4 * r + 2] * s4[2, :] + Tm[4 * r + 3]
            for r in range(3)
        ]                                 # 3 x (TS,)
        w_src = s4[3, :]

        # distance tile (TM, TS) + penalty column for masked targets.
        # (A K=3 MXU matmul for the cross term measured SLOWER than these
        # VPU passes: f32-highest matmuls decompose into multiple bf16
        # passes and K pads to 128 — 43x contraction waste.)
        # penalty column seeds the accumulator (one full-tile pass saved
        # vs zeros-init + post-add)
        d2 = jnp.broadcast_to(t5[:, 3][:, None], (tm, ts))
        for k in range(3):
            diff = t5[:, k:k + 1] - p[k][None, :]
            d2 = d2 + diff * diff

        dmin = jnp.min(d2, axis=0)                               # (TS,)
        # tie-averaging (d2 <= min) one-hot (the r4 vgicp structure): drops
        # the exact-first iota/== passes; exact-f32 ties select together
        # and their coordinates average via the ones column — equivalent to
        # splitting the correspondence weight among exactly-equidistant
        # targets, which the Horn moments accept unchanged
        onehot = (d2 <= dmin[None, :]).astype(jnp.float32)       # (TM, TS)
        # matched-target coords + tie count via ONE MXU matmul t5^T @ onehot
        # instead of per-coordinate (TM, TS) one-hot reduce passes
        qsel = jax.lax.dot_general(
            t5, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # (5, TS)
        cnt = jnp.maximum(qsel[4], 1.0)
        q = [qsel[k] / cnt for k in range(3)]

        w = w_src * (dmin < gate)

        # weighted moments, reduced over lanes -> 17 scalars
        mom = [jnp.sum(w)]
        mom += [jnp.sum(w * p[a]) for a in range(3)]
        mom += [jnp.sum(w * q[a]) for a in range(3)]
        for a in range(3):
            for b in range(3):
                mom.append(jnp.sum(w * p[a] * q[b]))
        mom.append(jnp.sum(w * dmin))
        # ungated fitness sums (PCL getFitnessScore has no gate): ride along
        # so the post-convergence evaluation needs a single pass
        mom.append(jnp.sum(w_src * dmin))
        mom.append(jnp.sum(w_src))
        vals = jnp.stack(mom)             # (19,)
        out_ref[i, : vals.shape[0]] = vals
        out_ref[i, vals.shape[0]:] = jnp.zeros(
            (_NMOM - vals.shape[0],), jnp.float32
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_correspondence_dist", "ts", "interpret")
)
def icp_iteration_moments(
    T: jnp.ndarray,
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    max_correspondence_dist: float = 1e8,
    ts: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused pass -> (19,) moments
    [sw, swp(3), swq(3), swpq(9), swd2, swd2_ungated, sw_ungated].

    Correspondences beyond max_correspondence_dist (static) get weight 0;
    the trailing pair sums every valid source point regardless of the gate
    (PCL getFitnessScore semantics).
    """
    n, m = src_xyz.shape[0], tgt_xyz.shape[0]
    ts = min(ts, max(8, n))
    pad_n = (-n) % ts
    src4 = jnp.concatenate(
        [src_xyz.astype(jnp.float32), src_mask.astype(jnp.float32)[:, None]],
        axis=-1,
    )
    src4 = jnp.pad(src4, ((0, pad_n), (0, 0))).T            # (4, Np)
    tm = m + ((-m) % 8)
    tgt_p = jnp.pad(tgt_xyz.astype(jnp.float32), ((0, tm - m), (0, 0)))
    pen = jnp.where(tgt_mask > 0.5, 0.0, _BIG).astype(jnp.float32)
    pen = jnp.pad(pen, (0, tm - m), constant_values=_BIG)
    ones = jnp.ones((tm, 1), jnp.float32)
    tgt5 = jnp.concatenate([tgt_p, pen[:, None], ones], axis=-1)  # (TM, 5)
    T16 = T.astype(jnp.float32).reshape(1, 16)

    np_ = src4.shape[1]
    ns = np_ // ts
    out = pl.pallas_call(
        _make_icp_moments_kernel(max_correspondence_dist),
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ts), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 5), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ns, _NMOM), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, _NMOM), jnp.float32),
        interpret=interpret,
    )(T16, src4, tgt5)
    moments = jnp.sum(out, axis=0)[:19]
    return moments


def icp_iteration_moments_xla(
    T: jnp.ndarray,
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    max_correspondence_dist: float = 1e8,
) -> jnp.ndarray:
    """Reference XLA implementation (CPU tests / fallback)."""
    from icp4dradar_tpu.geom.se3 import se3_apply
    from icp4dradar_tpu.ops.knn import nearest_neighbor_xla

    p = se3_apply(T, src_xyz)
    idx, d2 = nearest_neighbor_xla(p, tgt_xyz, tgt_mask)
    q = tgt_xyz[idx]
    gate = min(float(max_correspondence_dist) ** 2
               if max_correspondence_dist < 1e15 else float(_BIG) * 0.5,
               float(_BIG) * 0.5)
    w = src_mask * (d2 < gate)
    mom = [jnp.sum(w)]
    mom += [jnp.sum(w * p[:, a]) for a in range(3)]
    mom += [jnp.sum(w * q[:, a]) for a in range(3)]
    for a in range(3):
        for b in range(3):
            mom.append(jnp.sum(w * p[:, a] * q[:, b]))
    mom.append(jnp.sum(w * d2))
    mom.append(jnp.sum(src_mask * d2))
    mom.append(jnp.sum(src_mask))
    return jnp.stack(mom)


def moments_to_transform(moments: jnp.ndarray, dtype=jnp.float32):
    """(17,) moments -> (dT (4,4) Horn best-fit of p onto q, mean d2).

    dT is the incremental correction: apply as T <- dT @ T. With no valid
    correspondences (weight sum ~ 0) dT must be the identity — the Davenport
    power iteration on a zero matrix would otherwise return an arbitrary
    rotation from its start vector.
    """
    from icp4dradar_tpu.geom.kabsch import _rotation_from_cross_covariance
    from icp4dradar_tpu.geom.se3 import se3_from_rt

    sw = jnp.maximum(moments[0], 1e-9)
    mu_p = moments[1:4] / sw
    mu_q = moments[4:7] / sw
    pq = moments[7:16].reshape(3, 3)
    H = pq - sw * jnp.outer(mu_p, mu_q)
    R = _rotation_from_cross_covariance(H)
    t = mu_q - R @ mu_p
    mean_d2 = moments[16] / sw
    degenerate = moments[0] < 1.0
    dT = jnp.where(degenerate, jnp.eye(4, dtype=dtype),
                   se3_from_rt(R.astype(dtype), t.astype(dtype)))
    return dT, jnp.where(degenerate, jnp.asarray(0.0, dtype), mean_d2)
