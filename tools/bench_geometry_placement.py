"""Per-kernel geometry placement benchmark: host CPU vs accelerator.

Decides the production placement of each geometry kernel now that round-5
reached CPU/TPU accuracy parity (tools/parity_sweep.py). The tradeoff is
dispatch latency (tunnel ~10-30 ms/call on dev boxes) vs MXU throughput on
the big batched solves (ADVICE r4: scope the CPU hop instead of hopping
everything).

Usage: python tools/bench_geometry_placement.py [--pairs 64] [--tracks 20000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *a, warmup=1, iters=3):
    import jax

    for _ in range(warmup):
        r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*a)
        jax.block_until_ready(r)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--n-pad", type=int, default=2048)
    ap.add_argument("--tracks", type=int, default=20000)
    ap.add_argument("--cams", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from detectorfreesfm_tpu.sfm import twoview as tv
    from detectorfreesfm_tpu.core import triangulation as tri

    rng = np.random.default_rng(0)
    B, N = args.pairs, args.n_pad

    x0 = rng.normal(size=(B, N, 2)).astype(np.float32) * 0.3
    x1 = (x0 + rng.normal(size=x0.shape).astype(np.float32) * 0.01)
    mask = np.ones((B, N), bool)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(B)])
    thr = np.full((B,), 0.004, np.float32)

    rows = []
    for dev in ("cpu", "accel"):
        os.environ["DFSFM_GEOMETRY_DEVICE"] = dev
        dt = timeit(
            lambda: tv.estimate_relative_pose_batch(
                jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(mask),
                jnp.asarray(rngs), jnp.asarray(thr)))
        rows.append((f"twoview_batch B={B} N={N}", dev, dt))

    # triangulation: tracks x views
    V = 8
    P = rng.normal(size=(args.tracks, V, 3, 4)).astype(np.float32)
    uv = rng.normal(size=(args.tracks, V, 2)).astype(np.float32) * 100
    m = np.ones((args.tracks, V), bool)
    for dev in ("cpu", "accel"):
        os.environ["DFSFM_GEOMETRY_DEVICE"] = dev
        dt = timeit(
            lambda: tri.triangulate_dlt(
                jnp.asarray(P), jnp.asarray(uv), jnp.asarray(m)))
        rows.append((f"triangulate {args.tracks}x{V}", dev, dt))

    # Full BA solve on a realistic problem (the production bundle_adjust
    # driver: padding, LM loop, acceptance logic — what a scene pays)
    sys.path.insert(0, "tools")
    from bench_ba import build_ba_problem

    q, t, intr, pts, obs_uv, obs_cam, obs_pt = build_ba_problem(
        args.cams, args.cams * 40)
    from detectorfreesfm_tpu.sfm.ba import bundle_adjust

    for dev in ("cpu", "accel"):
        os.environ["DFSFM_GEOMETRY_DEVICE"] = dev
        dt = timeit(
            lambda: bundle_adjust(
                q, t, intr, pts, obs_uv, obs_cam, obs_pt,
                max_iters=10, schur_mode="pcg")[4],
            warmup=1, iters=2)
        rows.append((f"bundle_adjust10 C={args.cams}", dev, dt))
    print(f"{'kernel':34s} {'cpu ms':>9s} {'accel ms':>9s} {'accel/cpu':>9s}")
    by = {}
    for name, dev, dt in rows:
        by.setdefault(name, {})[dev] = dt * 1e3
    for name, d in by.items():
        print(f"{name:34s} {d['cpu']:9.1f} {d['accel']:9.1f} "
              f"{d['accel'] / d['cpu']:9.2f}")


if __name__ == "__main__":
    main()
