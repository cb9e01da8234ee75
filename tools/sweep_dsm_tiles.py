"""Tile-size sweep for the fused Pallas dual-softmax kernel at 1600 px.

Run: python tools/sweep_dsm_tiles.py [--size 1600] [--iters 4]
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1600)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tiles", default="256x512,512x512,512x1024,1024x1024,512x2048,1024x2048")
    args = ap.parse_args()

    from detectorfreesfm_tpu.ops.pallas_dsm import dual_softmax_stats

    on_tpu = jax.default_backend() == "tpu"
    size = args.size if on_tpu else 256
    h8 = size // 8
    L = h8 * h8
    C = 256
    f0 = jax.random.normal(jax.random.PRNGKey(0), (L, C), jnp.bfloat16)
    f1 = jax.random.normal(jax.random.PRNGKey(1), (L, C), jnp.bfloat16)
    m = jnp.ones((L,), bool)

    for spec in args.tiles.split(","):
        tl, ts = (int(x) for x in spec.split("x"))
        fn = jax.jit(functools.partial(
            dual_softmax_stats, temperature=0.1, tile_l=tl, tile_s=ts,
            interpret=not on_tpu))
        try:
            out = fn(f0, f1, m, m)
            jax.device_get(out[0].sum())
            jax.device_get(fn(f0, f1, m, m)[0].sum())
            t0 = time.perf_counter()
            outs = [fn(f0, f1, m, m) for _ in range(args.iters)]
            for o in outs:
                jax.device_get(o[0].sum())
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(json.dumps({"tile": spec, "ms": round(ms, 1)}), flush=True)
        except Exception as e:  # VMEM overflow etc.
            print(json.dumps({"tile": spec, "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
