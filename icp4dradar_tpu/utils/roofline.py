"""Analytic roofline / MFU accounting for the hot kernels (VERDICT r3 #4).

The reference has no hardware-utilization story at all (its budget is the
100 Hz loop cap, src/iterative_closest_point.cpp:258); every perf claim in
this repo was previously scans/s relative to that cap. This module converts
"fast" into *achieved fraction of the chip's peak*, per kernel, with the
bottleneck wall named — so the serving-analysis claim "the VGICP sweep is
compute/HBM-bound" (docs/PERFORMANCE.md r3) is a measurement, not an
assertion.

Peak numbers (TPU v5e, single chip) and the assumptions behind them:

- MXU bf16: 197 TFLOP/s (published; 4 MXUs x 128x128 x 2 FLOP x ~1.5 GHz).
- MXU f32 "highest" precision: ~197/6 = 33 TFLOP/s. The package globally
  forces highest-precision matmuls (icp4dradar_tpu/__init__.py — bf16
  truncation produces meter-scale errors at radar ranges), which XLA
  implements as a multi-pass bf16 decomposition (6 passes bounds the f32
  throughput at 1/6 of bf16 peak). Treated as an upper bound.
- VPU f32: ~6 TFLOP/s (8x128 lanes x 4 ALUs x ~1.5 GHz = 4096 FLOP/cycle;
  same clock assumption as the MXU figure). Elementwise/compare/select ops
  all count as 1 FLOP — the roofline convention for predication-heavy code.
- HBM: 819 GB/s, 16 GB (published).
- Fixed-op dispatch floor: every gather/scatter/sort dispatch costs
  ~0.08 ms nearly independent of row count (re-measured r4 with the
  dispatch-bias-corrected harness; the r1-r3 figure of 0.13-0.25 ms
  included ~25/reps ms of tunnel dispatch latency). Kernels built from
  few large ops hit FLOP/byte walls; kernels built from many small ops
  hit this wall first.

FLOP models (conventions: 1 compare/select/min = 1 FLOP; mul+add = 2):

- NN kernel (ops/knn.py::_nn_kernel), per (src N x tgt M) pair:
  d2 accumulation 3x(sub+mul+add) = 9, penalty add 1, min-reduce 1,
  argmin (where+iota-min) 2  ->  ~13 VPU FLOPs per pair.
- VGICP sweep (ops/vgicp_fused.py::_make_vgicp_kernel), per pair
  (r4 structure: exact-f32 distances, tie-averaging one-hot): d2
  accumulation 3x(sub+mul+add) = 9, penalty add 1, min-reduce 1,
  (<=)-onehot 1 -> 12 VPU FLOPs; payload contraction [t|ones]^T @ onehot
  = 2*10 = 20 f32 MXU FLOPs; plus ~300 VPU FLOPs per *source point* for
  the Mahalanobis GN accumulator tail (covariance rotation 75, 3x3
  inverse ~40, H/g assembly ~185 — counted off _gn_accumulators).
- Insert chain (mapping/voxel_hash.py::voxel_map_insert): FLOPs are
  negligible; the cost model is OP COUNT x fixed dispatch floor plus one
  lexicographic sort. Per call: 1 six-column sort, ceil(max_probes/W)
  probe rounds x ~4 gather/scatter each, ~6 post-loop deposit scatters.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

# ---- v5e peaks (see module docstring for derivations/assumptions) ----
V5E_MXU_BF16_TFLOPS = 197.0
V5E_MXU_F32_TFLOPS = V5E_MXU_BF16_TFLOPS / 6.0   # highest-precision bound
V5E_VPU_F32_TFLOPS = 6.1
V5E_HBM_GBPS = 819.0
FIXED_OP_MS = 0.08          # r4 corrected-harness gather/scatter floor


@dataclass(frozen=True)
class KernelRoofline:
    """One kernel's analytic work + a measured time -> utilizations."""

    name: str
    vpu_flops: float = 0.0
    mxu_flops: float = 0.0
    hbm_bytes: float = 0.0
    fixed_ops: int = 0      # gather/scatter/sort dispatches (fixed floor)

    def report(self, measured_s: float) -> dict:
        """Achieved rates vs peak + the named bottleneck wall."""
        vpu_t = self.vpu_flops / (V5E_VPU_F32_TFLOPS * 1e12)
        mxu_t = self.mxu_flops / (V5E_MXU_F32_TFLOPS * 1e12)
        hbm_t = self.hbm_bytes / (V5E_HBM_GBPS * 1e9)
        fix_t = self.fixed_ops * FIXED_OP_MS * 1e-3
        walls = {"VPU f32": vpu_t, "MXU f32": mxu_t, "HBM BW": hbm_t,
                 "fixed-op dispatch": fix_t}
        wall, wall_t = max(walls.items(), key=lambda kv: kv[1])
        out = {
            "kernel": self.name,
            "measured_ms": round(measured_s * 1e3, 3),
            "bound_by": wall,
            # fraction of peak on the binding wall: how close the kernel
            # runs to the speed-of-light time for its dominant resource
            "roofline_fraction": round(wall_t / measured_s, 3)
            if measured_s > 0 else 0.0,
            "speed_of_light_ms": round(wall_t * 1e3, 3),
        }
        if self.vpu_flops:
            out["achieved_vpu_tflops"] = round(
                self.vpu_flops / measured_s / 1e12, 3)
            out["vpu_peak_fraction"] = round(vpu_t / measured_s, 3)
        if self.mxu_flops:
            out["achieved_mxu_tflops"] = round(
                self.mxu_flops / measured_s / 1e12, 3)
            out["mxu_peak_fraction"] = round(mxu_t / measured_s, 3)
        if self.hbm_bytes:
            out["achieved_gbps"] = round(
                self.hbm_bytes / measured_s / 1e9, 2)
            out["hbm_peak_fraction"] = round(hbm_t / measured_s, 3)
        if self.fixed_ops:
            out["fixed_ops"] = self.fixed_ops
            out["ms_per_fixed_op"] = round(
                measured_s * 1e3 / self.fixed_ops, 3)
        return out


def nn_kernel_roofline(n: int, m: int, ts: int = 512,
                       tm: int = 2048) -> KernelRoofline:
    """Brute-force 1-NN sweep (ops/knn.py), padded tile grid."""
    np_ = n + (-n) % min(ts, max(8, n))
    mp_ = m + (-m) % tm
    pairs = float(np_) * mp_
    ns, nt = np_ // min(ts, max(8, n)), mp_ // tm
    # HBM: src re-streamed per target tile, tgt re-streamed per src block
    bytes_ = nt * np_ * 12.0 + ns * mp_ * 16.0
    return KernelRoofline("nn_sweep", vpu_flops=13.0 * pairs,
                          hbm_bytes=bytes_)


def vgicp_sweep_roofline(n: int, m: int, ts: int = 2048,
                         tm: int = 1024) -> KernelRoofline:
    """One fused VGICP NN-sweep + GN-accumulate pass (ops/vgicp_fused.py,
    r4 exact-distance + tie-averaging structure)."""
    ts = min(ts, max(8, n))
    np_ = n + (-n) % ts
    tmt = min(tm, m + (-m) % 8)
    mp_ = m + (-m) % tmt
    pairs = float(np_) * mp_
    ns, nt = np_ // ts, mp_ // tmt
    bytes_ = nt * np_ * 40.0 + ns * mp_ * 44.0    # 10/11-col f32 payloads
    return KernelRoofline(
        "vgicp_sweep",
        vpu_flops=12.0 * pairs + 300.0 * np_,
        mxu_flops=20.0 * pairs,
        hbm_bytes=bytes_,
    )


def insert_roofline(n: int, capacity: int, max_probes: int = 8,
                    window: int = 4) -> KernelRoofline:
    """Batched voxel-hash insert (mapping/voxel_hash.py): fixed-op model.

    ~4 gather/scatter dispatches per probe round + the 6-key sort + ~6
    deposit scatters; bytes are the touched rows, far under the BW wall.

    r5 negative results (measured on v5e, 2048 pts -> 2^18 slots): widening
    the probe window to one full-budget round read 1.19 vs 1.15 ms, and
    folding the deposits into one (C,15) read-modify-write scatter read
    2.95 ms (15-lane rows pad to 128 lanes; wide-gather traffic dwarfs the
    saved dispatches). The W=4 two-round + split-deposit layout stands as
    the measured optimum — treat this model's op count as the effective
    dispatch budget, not a target to shrink further."""
    rounds = math.ceil(max_probes / window)
    ops = 1 + 4 * rounds + 6          # sort + rounds + deposits
    bytes_ = n * (11 * 4 + window * 12) + n * 10 * 4
    return KernelRoofline("voxel_insert", fixed_ops=ops, hbm_bytes=bytes_,
                          vpu_flops=60.0 * n)


def measure_hot_kernels(reps: int = 256, n: int = 2048, m: int = 16384,
                        capacity: int = 1 << 18, best_of: int = 3) -> list:
    """Time the three hot kernels on the current backend and return their
    roofline reports. Each kernel runs `reps` times inside ONE lax.scan
    dispatch (per-dispatch latency through the axon tunnel is ~25 ms — a
    per-call loop would measure the tunnel, CLAUDE.md), with a value
    dependency threaded through the carry so XLA cannot elide iterations.

    Round-4 correction: the residual dispatch bias is ~25/reps ms PER REP —
    at the r3 default reps=32 that is ~0.8 ms, which exceeded the true cost
    of two of the three kernels (docs/roofline_r4.json as first committed
    was inflated by exactly this). Now reps defaults high enough to push the
    bias under ~0.1 ms/rep AND an empty-chain floor (same scan structure,
    trivial body) is measured and subtracted; each report carries the floor
    in "floor_ms_per_rep" so the correction is visible.

    Utilization fractions are only meaningful on TPU; callers should label
    CPU runs as smoke."""
    import time

    import jax
    import jax.numpy as jnp

    from icp4dradar_tpu.mapping.voxel_hash import (
        voxel_map_create, voxel_map_insert,
    )
    from icp4dradar_tpu.ops.knn import nearest_neighbor_pallas
    from icp4dradar_tpu.ops.vgicp_fused import (
        radar_point_covariances_packed, vgicp_iteration,
    )

    on_tpu = jax.default_backend() == "tpu"
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    src = jax.random.uniform(k1, (n, 3), jnp.float32, -40.0, 40.0)
    tgt = jax.random.uniform(k2, (m, 3), jnp.float32, -40.0, 40.0)
    mask_n = jnp.ones(n, jnp.float32)
    mask_m = jnp.ones(m, jnp.float32)
    cov6 = radar_point_covariances_packed(src)
    tcov6 = jnp.broadcast_to(
        jnp.asarray([0.05, 0.05, 0.05, 0.0, 0.0, 0.0], jnp.float32), (m, 6))
    T0 = jnp.eye(4, dtype=jnp.float32)

    import numpy as np

    import functools

    def timed(fn, *args, reps=reps):
        # time to HOST MATERIALIZATION: jax.block_until_ready is a no-op
        # through the axon tunnel (measured; see bench.py note) — np.asarray
        # of the scalar carry faithfully waits for the computation
        run = jax.jit(fn)
        np.asarray(run(*args))                     # compile
        ts = []
        for _ in range(best_of):
            t0 = time.time()
            np.asarray(run(*args))
            ts.append(time.time() - t0)
        return min(ts) / reps

    def floor_loop(length, s):
        # empty chain with the same scan structure: measures dispatch +
        # per-iteration loop overhead, subtracted from every kernel time.
        # Measured PER LENGTH — the dominant term is dispatch/length.
        # *1e-30 with the carry folded into the INPUT, never *0.0: XLA
        # folds x*0 and would collapse the chain to pure dispatch
        # (CLAUDE.md measurement rule; the kernel loops use the same
        # carried-dependence shape).
        def body(acc, _):
            return acc + jnp.sum(s + acc * 1e-30) * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return acc

    def nn_loop(length, s, t):
        def body(acc, _):
            _, d = nearest_neighbor_pallas(
                s + 1e-12 * acc, t, interpret=not on_tpu)
            return jnp.sum(d), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return acc

    def vgicp_loop(length, s, t):
        def body(acc, _):
            H, g, cost, wsum, d2 = vgicp_iteration(
                T0, s + 1e-12 * acc, mask_n, cov6, t, tcov6, mask_m,
                interpret=not on_tpu)
            return cost + wsum, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return acc

    def insert_loop(length, s):
        vm0 = voxel_map_create(capacity, 0.5, 8)
        def body(vm, _):
            return voxel_map_insert(vm, s, mask_n), None
        vm, _ = jax.lax.scan(body, vm0, None, length=length)
        return jnp.sum(vm.occupied)      # scalar: cheap host materialization

    # Per-kernel rep counts: each kernel's chain must be LONG relative to
    # the ~25 ms dispatch so the floor subtraction has signal — the NN
    # kernel at ~0.01 ms/rep needs ~16x more reps than the ~1 ms insert
    # (a shared count left the nn measurement inside dispatch jitter and
    # once printed a nonsense 893868%-of-peak reading).
    reports = []
    floors = {}
    for name, model, loop, args, scale in (
        ("nn", nn_kernel_roofline(n, n), nn_loop, (src, src[:n]), 16),
        ("vgicp", vgicp_sweep_roofline(n, m), vgicp_loop, (src, tgt), 2),
        ("insert", insert_roofline(n, capacity), insert_loop, (src,), 1),
    ):
        length = reps * scale if on_tpu else reps
        if length not in floors:
            floors[length] = timed(
                functools.partial(floor_loop, length), src, reps=length)
        floor = floors[length]
        dt = timed(functools.partial(loop, length), *args, reps=length)
        rep = model.report(max(dt - floor, 1e-9))
        rep["floor_ms_per_rep"] = round(floor * 1e3, 4)
        rep["reps"] = length
        reports.append(rep)
    return reports


def format_report(rep: dict) -> str:
    extra = []
    if "achieved_vpu_tflops" in rep:
        extra.append(f"VPU {rep['achieved_vpu_tflops']} TF/s "
                     f"({rep['vpu_peak_fraction']:.0%} of peak)")
    if "achieved_mxu_tflops" in rep:
        extra.append(f"MXU {rep['achieved_mxu_tflops']} TF/s "
                     f"({rep['mxu_peak_fraction']:.0%})")
    if "achieved_gbps" in rep:
        extra.append(f"HBM {rep['achieved_gbps']} GB/s "
                     f"({rep['hbm_peak_fraction']:.0%})")
    if "fixed_ops" in rep:
        extra.append(f"{rep['fixed_ops']} fixed ops @ "
                     f"{rep['ms_per_fixed_op']} ms")
    return (f"{rep['kernel']}: {rep['measured_ms']} ms, bound by "
            f"{rep['bound_by']} (speed-of-light {rep['speed_of_light_ms']} "
            f"ms, {rep['roofline_fraction']:.0%} of it) — "
            + "; ".join(extra))
