#!/usr/bin/env python
"""Roofline / MFU measurement for the three hot kernels (VERDICT r3 #4):
the VGICP NN-sweep, the scan-to-scan NN kernel, and the voxel-hash insert
chain. Each is timed inside one lax.scan dispatch on the real chip and
reported as achieved FLOP/s / bytes/s / per-op latency against TPU v5e
peaks, with the binding wall named (utils/roofline.py documents the peak
assumptions and analytic FLOP models).

Usage:
  python scripts/roofline_bench.py           # real TPU (the honest numbers)
  python scripts/roofline_bench.py --cpu     # smoke only (fractions
                                             # meaningless off-chip)

Writes docs/roofline_r5.json and prints the table to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=0,
                   help="iterations inside the timing scan "
                        "(default 256 TPU / 2 CPU)")
    p.add_argument("--out", default="docs/roofline_r5.json")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from icp4dradar_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(min_compile_secs=5)
    from icp4dradar_tpu.utils import roofline

    backend = jax.default_backend()
    reps = args.reps or (256 if backend == "tpu" else 2)
    print(f"backend: {backend} reps: {reps}", file=sys.stderr)
    if backend == "tpu":
        reports = roofline.measure_hot_kernels(reps=reps)
    else:
        # interpret-mode Pallas executes per-element on host — smoke at
        # tiny shapes just to prove the harness runs
        reports = roofline.measure_hot_kernels(
            reps=reps, n=128, m=256, capacity=1 << 12, best_of=1)
    for rep in reports:
        print(roofline.format_report(rep), file=sys.stderr)

    if args.cpu and args.out == "docs/roofline_r5.json":
        args.out = ""            # never shadow the TPU artifact with smoke
    out = {
        "bench": "roofline_r5",
        "backend": backend,
        "valid_utilization": backend == "tpu",
        "peaks": {
            "mxu_f32_tflops": roofline.V5E_MXU_F32_TFLOPS,
            "vpu_f32_tflops": roofline.V5E_VPU_F32_TFLOPS,
            "hbm_gbps": roofline.V5E_HBM_GBPS,
            "fixed_op_ms": roofline.FIXED_OP_MS,
        },
        "kernels": reports,
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
