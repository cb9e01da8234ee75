"""ETH3D-resolution (1600 px) coarse-matching throughput bench.

The round-1 number was 8.9 pairs/s at batch 1 (fused Pallas dual-softmax;
the dense path cannot allocate the 40k x 40k conf matrix at all). VERDICT
round-1 item #5 asks for >=2x via batching + pipelining. This tool measures
pairs/s at several batch sizes with the production forward (models/loftr.py,
fused_matching=True) using the bench.py throughput protocol: jit once, warm
twice, launch all iterations, one dependent-scalar sync at the end (the dev
tunnel's block_until_ready returns early; per-iteration syncs would charge
~30 ms transport to every batch).

Run: python tools/bench_1600.py [--size 1600] [--batches 1,2,4] [--iters 4]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def bench_batch(model, params, size: int, batch: int, iters: int) -> float:
    rng = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(rng, (batch, size, size, 1), jnp.float32)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), img0.shape, jnp.float32)
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))

    def sync(out):
        return float(jax.device_get(out.conf.sum()))

    sync(fwd(params, img0, img1))
    sync(fwd(params, img0, img1))
    t0 = time.perf_counter()
    outs = [fwd(params, img0, img1) for _ in range(iters)]
    for o in outs:
        sync(o)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1600)
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--fast-exp", action="store_true", dest="fast_exp",
                    help="Schraudolph exp in the fused DSM lse pass")
    args = ap.parse_args()

    from detectorfreesfm_tpu.models.loftr import (
        DetectorFreeMatcher, MatcherConfig,
    )

    on_tpu = jax.default_backend() == "tpu"
    size = args.size if on_tpu else 256
    cfg = MatcherConfig(
        compute_dtype="bfloat16" if on_tpu else "float32",
        max_matches=4096 if on_tpu else 128,
        fused_matching=True,
        dsm_fast_exp=args.fast_exp,
    )
    model = DetectorFreeMatcher(cfg)
    dummy = jnp.zeros((1, size, size, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), dummy, dummy)

    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        pps = bench_batch(model, params, size, b, args.iters)
        results[b] = round(pps, 3)
        print(json.dumps({
            "metric": f"coarse_pairs_per_s_{size}px_b{b}",
            "value": results[b], "unit": "pairs/s",
        }), flush=True)
    best = max(results.values())
    print(json.dumps({
        "metric": f"coarse_pairs_per_s_{size}px_best",
        "value": best, "unit": "pairs/s",
        "vs_round1": round(best / 8.9, 3) if size == 1600 else None,
    }))


if __name__ == "__main__":
    main()
