"""Decompose the VGICP sweep kernel cost on the real chip and test
structural variants.

Measurement method (the round-4 correction): a single host dispatch through
the axon tunnel costs ~25 ms, so any kernel timed with N in-jit reps reads
~25/N ms too high. Worse, without a data dependence between reps XLA can
overlap or hoist them. This harness chains every rep through the transform
(each call's output perturbs the next call's input by 0), uses enough reps
to make the dispatch bias < 2 us, and subtracts the measured empty-chain
floor. docs/roofline_r4.json was measured with 32 undependent reps and is
inflated by ~0.7 ms/kernel; scripts/roofline_bench.py now uses this method.

Usage: python scripts/sweep_microbench.py [--reps 512]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import icp4dradar_tpu  # noqa: F401  (forces highest matmul precision)
from icp4dradar_tpu.ops.vgicp_fused import (  # noqa: E402
    _NOUT,
    _gn_accumulators,
    _sym_inv3,
    _unpack_accumulators,
    radar_point_covariances_packed,
    vgicp_iteration,
    vgicp_iteration_frozen,
)

_BIG = np.float32(1e30)


def chain(step, reps):
    """step: T (4,4) -> (scalar, aux...). Returns jitted runner executing
    `reps` strictly ordered calls (each output perturbs the next input)."""

    @jax.jit
    def run(T):
        def body(T, _):
            out = step(T)
            scalar = out[0] if isinstance(out, tuple) else out
            return T.at[0, 3].add(scalar * 1e-30), None
        T, _ = jax.lax.scan(body, T, None, length=reps)
        return T

    return run


def timeit_chain(step, T0, reps, floor_ms=0.0, best_of=5):
    run = chain(step, reps)
    jax.block_until_ready(run(T0))
    ts = []
    for _ in range(best_of):
        t0 = time.perf_counter()
        jax.block_until_ready(run(T0))
        ts.append((time.perf_counter() - t0) / reps * 1e3)
    return min(ts) - floor_ms


# ---------------------------------------------------------------- variants


def _nn_block(t, p, tm, lte=False):
    """Shipped NN structure: 3 squared-diff passes + min/arg/onehot +
    payload matmul. Returns (10, ts) payload rows [d2, mean3, cov6].
    `lte`: drop the iota/== exact-first pass — select with (d2 <= dmin)
    and tie-average the payload via the count column (t must carry a ones
    column at index 11)."""
    d2 = jnp.zeros((tm, p[0].shape[0]), jnp.float32)
    for k in range(3):
        diff = t[:, k:k + 1] - p[k][None, :]
        d2 += diff * diff
    d2 += t[:, 9][:, None]
    dmin_j = jnp.min(d2, axis=0)
    if lte:
        onehot = (d2 <= dmin_j[None, :]).astype(jnp.float32)
        tsel10 = jax.lax.dot_general(
            jnp.concatenate([t[:, :9], t[:, 11:12]], axis=1),
            onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cnt = jnp.maximum(tsel10[9], 1.0)
        tsel = tsel10[:9] / cnt[None, :]
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        arg = jnp.min(jnp.where(d2 <= dmin_j[None, :], rows, tm), axis=0)
        onehot = (rows == arg[None, :]).astype(jnp.float32)
        tsel = jax.lax.dot_general(
            t[:, :9], onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.concatenate([dmin_j[None, :], tsel], axis=0)


def _nn_block_mxu(t, p, tm, precision=jax.lax.Precision.DEFAULT, lte=False):
    """MXU variant: argmin over |t|^2 - 2 t.p via one matmul at `precision`;
    winner's d2 recomputed exactly in f32. t layout (tm, 12): mean3, cov6,
    penalty, |t|^2, ones. `lte`: skip the iota/== exact-first pass and select
    with (score <= smin), normalizing the payload by the tie count (ties
    average — benign for near-equidistant voxels)."""
    pmat = jnp.stack(p, axis=0)
    cross = jax.lax.dot_general(
        t[:, :3], pmat, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)
    score = (t[:, 10][:, None] + t[:, 9][:, None]) - 2.0 * cross
    smin_j = jnp.min(score, axis=0)
    if lte:
        onehot = (score <= smin_j[None, :]).astype(jnp.float32)
        tsel10 = jax.lax.dot_general(
            jnp.concatenate([t[:, :9], t[:, 11:12]], axis=1),
            onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cnt = jnp.maximum(tsel10[9], 1.0)
        tsel = tsel10[:9] / cnt[None, :]
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
        arg = jnp.min(jnp.where(score <= smin_j[None, :], rows, tm), axis=0)
        onehot = (rows == arg[None, :]).astype(jnp.float32)
        tsel = jax.lax.dot_general(
            t[:, :9], onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    d2w = ((tsel[0] - p[0]) ** 2 + (tsel[1] - p[1]) ** 2
           + (tsel[2] - p[2]) ** 2)
    d2w = jnp.where(smin_j < _BIG * 0.5, d2w, 1e30)
    return jnp.concatenate([d2w[None, :], tsel], axis=0)


# Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST (6-pass) in-kernel
_MXU_MODES = {
    "mxu": (jax.lax.Precision.DEFAULT, False),
    "mxux": (jax.lax.Precision.HIGHEST, False),
    "mxul": (jax.lax.Precision.DEFAULT, True),
}


def make_sweep_kernel(variant, max_d2, cov_eps, ts, tm):
    gate = min(float(max_d2), float(_BIG) * 0.5)
    mxu = variant in _MXU_MODES

    def kernel(cnt_ref, T_ref, src_ref, tgt_ref, best_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nt = pl.num_programs(1)

        Tm = T_ref[0, :]
        R = [[Tm[0], Tm[1], Tm[2]], [Tm[4], Tm[5], Tm[6]],
             [Tm[8], Tm[9], Tm[10]]]
        s = src_ref[:]
        w_src = s[3]
        ca = [s[4 + k] for k in range(6)]
        p = [R[r][0] * s[0] + R[r][1] * s[1] + R[r][2] * s[2] + Tm[4 * r + 3]
             for r in range(3)]

        @pl.when(j == 0)
        def _():
            row10 = jax.lax.broadcasted_iota(jnp.int32, (10, ts), 0)
            best_ref[i, :, :] = jnp.where(row10 == 0, 1e30, 0.0)

        @pl.when((j == 0) | (j * tm < cnt_ref[0, 0]))
        def _():
            t = tgt_ref[:]
            if mxu:
                prec, lte = _MXU_MODES[variant]
                payload_j = _nn_block_mxu(t, p, tm, prec, lte)
            elif variant == "xlte":
                payload_j = _nn_block(t, p, tm, lte=True)
            else:
                payload_j = _nn_block(t, p, tm)
            better = payload_j[0, :] < best_ref[i, 0, :]
            best_ref[i, :, :] = jnp.where(better[None, :], payload_j,
                                          best_ref[i, :, :])

        if variant == "nn_only":
            @pl.when(j == nt - 1)
            def _():
                out_ref[i, :] = jnp.zeros((_NOUT,), jnp.float32)
        else:
            @pl.when(j < nt - 1)
            def _():
                out_ref[i, :] = jnp.zeros((_NOUT,), jnp.float32)

            @pl.when(j == nt - 1)
            def _():
                best = best_ref[i, :, :]
                out_ref[i, :] = _gn_accumulators(
                    R, p, w_src, ca, best, best[0, :], gate, cov_eps)

    return kernel


def make_variant_step(variant, src10, tgt_pack, cnt, ts, tm):
    n10 = src10.shape[0]
    ns = src10.shape[1] // ts
    nt = tgt_pack.shape[0] // tm
    tw = tgt_pack.shape[1]

    def step(T):
        best, out = pl.pallas_call(
            make_sweep_kernel(variant, 4.0, 1e-3, ts, tm),
            grid=(ns, nt),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 16), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n10, ts), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, tw), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ns, 10, ts), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ns, _NOUT), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ns, 10, ts), jnp.float32),
                jax.ShapeDtypeStruct((ns, _NOUT), jnp.float32),
            ],
        )(cnt, T.reshape(1, 16), src10, tgt_pack)
        acc = jnp.sum(out, axis=0)
        # *1e-30, never *0.0: XLA folds x*0 and would sever the chained
        # dependence on the `best` payload (CLAUDE.md measurement rule)
        return acc[0] + jnp.sum(best[:, 0, :]) * 1e-30, acc

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=512)
    args = ap.parse_args()
    reps = args.reps

    rng = np.random.default_rng(0)
    N, M = 2048, 16384
    src = (rng.normal(size=(N, 3)) * 20.0).astype(np.float32)
    tgt = np.concatenate(
        [src[rng.integers(0, N, M // 2)] + rng.normal(size=(M // 2, 3)) * 0.3,
         rng.normal(size=(M // 2, 3)) * 40.0]).astype(np.float32)
    cov6 = (np.abs(rng.normal(size=(M, 6))) * 0.01).astype(np.float32)
    cov6[:, :3] += 0.05
    T0 = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(
        jnp.array([0.3, -0.2, 0.1]))
    jsrc, jtgt, jtcov = map(jnp.asarray, (src, tgt, cov6))
    jmask = jnp.ones(N, jnp.float32)
    jtmask = jnp.ones(M, jnp.float32)
    jscov = radar_point_covariances_packed(jsrc)

    # *1e-30, never *0.0: a folded floor chain measures only dispatch,
    # not the per-iteration scan overhead it must subtract
    floor = timeit_chain(lambda T: jnp.sum(T) * 1e-30, T0, reps)
    print(f"harness floor (subtracted) {floor:8.4f} ms")

    ms = timeit_chain(
        lambda T: vgicp_iteration(T, jsrc, jmask, jscov, jtgt, jtcov,
                                  jtmask, return_best=True)[2],
        T0, reps, floor)
    print(f"base (shipped)            {ms:8.4f} ms")
    ref = vgicp_iteration(T0, jsrc, jmask, jscov, jtgt, jtcov, jtmask,
                          return_best=True)
    H_ref, best_payload = ref[0], ref[5]

    ms = timeit_chain(
        lambda T: vgicp_iteration_frozen(T, jsrc, jmask, jscov,
                                         best_payload)[2],
        T0, reps, floor)
    print(f"frozen (shipped)          {ms:8.4f} ms")

    # packed inputs for the experimental kernels
    src10 = jnp.concatenate(
        [jsrc, jmask[:, None], jscov], axis=-1).T.astype(jnp.float32)
    pen = jnp.where(jtmask > 0.5, 0.0, _BIG).astype(jnp.float32)
    tgt10 = jnp.concatenate([jtgt, jtcov, pen[:, None]], axis=-1)
    tnorm = jnp.sum(jtgt * jtgt, axis=-1, keepdims=True)
    tgt12 = jnp.concatenate(
        [tgt10, tnorm, jnp.ones_like(tnorm)], axis=-1)
    cnt = jnp.full((1, 1), M, jnp.int32)

    def check(name, acc):
        H, _, _, _, _ = _unpack_accumulators(np.asarray(acc), jnp.float32)
        err = float(np.max(np.abs(H - np.asarray(H_ref)))
                    / np.max(np.abs(np.asarray(H_ref))))
        print(f"    {name} H rel err vs shipped: {err:.2e}")

    for name, ts, tm, pack in (
        ("copy ts=512 tm=2048", 512, 2048, tgt10),
        ("nn_only ts=512 tm=2048", 512, 2048, tgt10),
        ("copy ts=1024 tm=2048", 1024, 2048, tgt10),
        ("copy ts=2048 tm=1024", 2048, 1024, tgt10),
        ("mxu ts=512 tm=2048", 512, 2048, tgt12),
        ("mxu ts=1024 tm=2048", 1024, 2048, tgt12),
        ("mxu ts=2048 tm=1024", 2048, 1024, tgt12),
        ("mxux ts=2048 tm=1024", 2048, 1024, tgt12),
        ("mxux ts=1024 tm=2048", 1024, 2048, tgt12),
        ("mxul ts=2048 tm=1024", 2048, 1024, tgt12),
        ("mxul ts=1024 tm=2048", 1024, 2048, tgt12),
        ("xlte ts=512 tm=2048", 512, 2048, tgt12),
        ("xlte ts=1024 tm=2048", 1024, 2048, tgt12),
        ("xlte ts=2048 tm=1024", 2048, 1024, tgt12),
    ):
        variant = name.split()[0]
        step = make_variant_step(variant, src10, pack, cnt, ts, tm)
        ms = timeit_chain(step, T0, reps, floor)
        print(f"{name:<26} {ms:8.4f} ms")
        if variant != "nn_only":
            check(name, step(T0)[1])


if __name__ == "__main__":
    main()
