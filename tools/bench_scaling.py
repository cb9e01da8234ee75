"""Scaling benchmark: matched pairs/s at 1..N devices (BASELINE.md protocol:
1 chip -> 1 host -> N hosts).

On a real pod slice this measures ICI-sharded pair matching; on a dev box,
set XLA_FLAGS=--xla_force_host_platform_device_count=8 to check the SPMD
path (numbers are then host-CPU, only the *scaling shape* is meaningful).

Usage: python tools/bench_scaling.py [--size 832] [--batch-per-dev 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=832)
    ap.add_argument("--batch-per-dev", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from detectorfreesfm_tpu.models.loftr import DetectorFreeMatcher, MatcherConfig
    from detectorfreesfm_tpu.parallel.mesh import make_mesh, replicate, shard_leading_axis

    on_tpu = jax.default_backend() == "tpu"
    cfg = MatcherConfig(
        compute_dtype="bfloat16" if on_tpu else "float32",
        max_matches=2048, fused_matching=on_tpu,
    )
    model = DetectorFreeMatcher(cfg)
    s = args.size
    rng = jax.random.PRNGKey(0)
    params0 = model.init(
        rng, jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1))
    )
    fwd = jax.jit(model.apply)

    results = []
    n_avail = len(jax.devices())
    n = 1
    while n <= n_avail:
        mesh = make_mesh(n)
        params = replicate(params0, mesh)
        b = args.batch_per_dev * n
        img0 = np.random.default_rng(0).uniform(0, 1, (b, s, s, 1)).astype(np.float32)
        img1 = np.random.default_rng(1).uniform(0, 1, (b, s, s, 1)).astype(np.float32)
        batch = shard_leading_axis((img0, img1), mesh)

        def run():
            out = fwd(params, *batch)
            return float(jax.device_get(out.conf.sum()))

        run(); run()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run()
        dt = (time.perf_counter() - t0) / args.iters
        pps = b / dt
        results.append({"devices": n, "pairs_per_s": round(pps, 2),
                        "efficiency": round(pps / (results[0]["pairs_per_s"] * n), 3)
                        if results else 1.0})
        print(json.dumps(results[-1]))
        n *= 2
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
