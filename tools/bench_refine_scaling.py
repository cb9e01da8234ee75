"""Scaling benchmark: multiview-refined tracks/s at 1..N devices.

Companion to bench_scaling.py (pair matching) for the refinement stage —
VERDICT round-1 item #3 asks for tracks/s scaling evidence at 1→N devices.
Uses the production forward exactly as refine/loop.py dispatches it: the
scene image stack replicated over the mesh, track-table chunks sharded on
the leading (track) axis, one jitted MultiviewRefiner apply per chunk.

On a real pod slice this measures ICI scaling; on a dev box set
XLA_FLAGS=--xla_force_host_platform_device_count=8 to check the SPMD path
(numbers are host-CPU; only the scaling shape is meaningful).

Usage: python tools/bench_refine_scaling.py [--tracks 2048] [--views 8]
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
    ap.add_argument("--tracks", type=int, default=None,
                    help="tracks per step (default: 2048 TPU / 256 CPU)")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--window", type=int, default=15)
    ap.add_argument("--n-images", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=832)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from detectorfreesfm_tpu.models.multiview_matcher import (
        MultiviewRefiner, RefinerConfig,
    )
    from detectorfreesfm_tpu.parallel.mesh import (
        make_mesh, replicate, shard_leading_axis,
    )

    on_tpu = jax.default_backend() == "tpu"
    tracks = args.tracks or (2048 if on_tpu else 256)
    img_size = args.img_size if on_tpu else 128
    cfg = RefinerConfig(
        crop_size=args.window + 4, window=args.window,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    model = MultiviewRefiner(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 1, (args.n_images, img_size, img_size, 1)), jnp.float32
    )

    v = args.views
    node_img0 = rng.integers(0, args.n_images, (tracks, v)).astype(np.int32)
    node_xy0 = rng.uniform(32, img_size - 32, (tracks, v, 2)).astype(np.float32)
    node_scale0 = np.ones((tracks, v), np.float32)
    node_mask0 = np.ones((tracks, v), bool)

    params = model.init(
        jax.random.PRNGKey(0), images[:1],
        jnp.asarray(node_img0[:1] * 0), jnp.asarray(node_xy0[:1]),
        jnp.asarray(node_scale0[:1]), jnp.asarray(node_mask0[:1]),
    )
    apply = jax.jit(model.apply)

    results = []
    n_avail = len(jax.devices())
    n = 1
    while n <= n_avail:
        mesh = make_mesh(n)
        params_dev = replicate(params, mesh)
        images_dev = replicate(images, mesh)
        batch = shard_leading_axis(
            (jnp.asarray(node_img0), jnp.asarray(node_xy0),
             jnp.asarray(node_scale0), jnp.asarray(node_mask0)), mesh,
        )

        def run():
            out = apply(params_dev, images_dev, *batch)
            return float(jax.device_get(out.coords.sum()))

        run(); run()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run()
        dt = (time.perf_counter() - t0) / args.iters
        tps = tracks / dt
        results.append({
            "devices": n, "tracks_per_s": round(tps, 1),
            "efficiency": round(tps / (results[0]["tracks_per_s"] * n), 3)
            if results else 1.0,
        })
        print(json.dumps(results[-1]), flush=True)
        n *= 2
    print(json.dumps({"refine_scaling": results}))


if __name__ == "__main__":
    main()
