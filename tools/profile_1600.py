"""Per-stage profile of the coarse matcher at ETH3D resolution (1600 px).

Times backbone, position-encoded transformer, and the fused Pallas
dual-softmax separately with the bench.py throughput protocol (jit once,
warm, launch N, single dependent-scalar sync), so the dev tunnel's ~30 ms
per-sync transport is amortized out.

Run: python tools/profile_1600.py [--size 1600] [--batch 1] [--iters 4]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timed(fn, args, sync, iters):
    out = fn(*args)
    sync(out)
    sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        sync(o)
    return (time.perf_counter() - t0) / iters, outs[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1600)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from detectorfreesfm_tpu.models.loftr import DetectorFreeMatcher, MatcherConfig
    from detectorfreesfm_tpu.models.backbone import ResNetFPN_8_2
    from detectorfreesfm_tpu.models.position_encoding import add_position_encoding
    from detectorfreesfm_tpu.models.transformer import LocalFeatureTransformer
    from detectorfreesfm_tpu.ops.pallas_dsm import fused_extract_matches
    from detectorfreesfm_tpu.ops.dual_softmax import border_mask

    on_tpu = jax.default_backend() == "tpu"
    size = args.size if on_tpu else 256
    b = args.batch
    cfg = MatcherConfig(
        compute_dtype="bfloat16" if on_tpu else "float32",
        max_matches=4096 if on_tpu else 128,
        fused_matching=on_tpu,
    )
    model = DetectorFreeMatcher(cfg)
    h8 = w8 = size // 8
    L = h8 * w8
    rng = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(rng, (b, size, size, 1), jnp.float32)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), img0.shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(2), img0[:1], img1[:1])

    # --- stage 1: backbone over both images (2B batch)
    bb = ResNetFPN_8_2(dtype=cfg.dtype)
    bb_params = {
        col: params[col]["backbone"]
        for col in params if "backbone" in params[col]
    }
    both = jnp.concatenate([img0, img1], axis=0).astype(cfg.dtype)
    bb_fwd = jax.jit(lambda p, x: bb.apply(p, x))
    dt, (coarse, fine) = timed(
        bb_fwd, (bb_params, both),
        lambda o: jax.device_get(o[0].sum()), args.iters)
    print(json.dumps({"stage": "backbone_2B", "ms": round(dt * 1e3, 1)}), flush=True)

    # Coarse-only backbone (what the production coarse pipeline pays: the
    # 1/2-res FPN fine path is dead code under jit when fine_enabled=False)
    bb_coarse = jax.jit(lambda p, x: bb.apply(p, x)[0])
    dt, _ = timed(
        bb_coarse, (bb_params, both),
        lambda o: jax.device_get(o.sum()), args.iters)
    print(json.dumps({"stage": "backbone_2B_coarse_only", "ms": round(dt * 1e3, 1)}), flush=True)

    # --- stage 2: coarse transformer (8 alternating layers)
    lt = LocalFeatureTransformer(
        d_model=cfg.d_coarse, nhead=cfg.nhead,
        layer_names=("self", "cross") * cfg.n_coarse_layers,
        attention="linear", dtype=cfg.dtype)
    lt_params = {"params": params["params"]["coarse_transformer"]}
    mask = jnp.broadcast_to(border_mask(h8, w8, cfg.border)[None], (b, L))

    def lt_fwd(p, c0, c1, m):
        return lt.apply(p, c0, c1, m, m)

    c0 = add_position_encoding(coarse[:b]).reshape(b, L, cfg.d_coarse)
    c1 = add_position_encoding(coarse[b:]).reshape(b, L, cfg.d_coarse)
    lt_jit = jax.jit(lt_fwd)
    dt, (t0_, t1_) = timed(
        lt_jit, (lt_params, c0, c1, mask),
        lambda o: jax.device_get(o[0].sum()), args.iters)
    print(json.dumps({"stage": "coarse_transformer", "ms": round(dt * 1e3, 1)}), flush=True)

    # --- stage 3: fused dual-softmax + extraction
    dsm = jax.jit(lambda a, bq, m: fused_extract_matches(
        a, bq, m, m, cfg.match_threshold, cfg.max_matches,
        temperature=cfg.dsoftmax_temperature))
    dt, _ = timed(
        dsm, (t0_, t1_, mask),
        lambda o: jax.device_get(o.conf.sum()), args.iters)
    print(json.dumps({"stage": "fused_dsm", "ms": round(dt * 1e3, 1)}), flush=True)

    # --- whole forward for reference
    fwd = jax.jit(lambda p, a, bq: model.apply(p, a, bq))
    dt, _ = timed(
        fwd, (params, img0, img1),
        lambda o: jax.device_get(o.conf.sum()), args.iters)
    print(json.dumps({"stage": "full_forward", "ms": round(dt * 1e3, 1),
                      "pairs_per_s": round(b / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
