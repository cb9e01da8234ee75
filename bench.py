"""Benchmark: matched pairs/s for the detector-free coarse matcher.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: batch of image pairs at the demo bucket (832x832 padded frame,
the reference demo config's img_resize 840 snapped to the /8 grid —
hydra_configs/demo/dfsfm.yaml), full coarse forward (ResNetFPN backbone +
4x(self,cross) linear-attention transformer + dual-softmax top-K extraction),
bf16 on TPU. Baseline: the reference's LoFTR coarse-only matcher sustains
~10 pairs/s at this resolution on one V100-class GPU (bs=1 loop,
src/coarse_match/coarse_match_worker.py:86); vs_baseline = pairs_per_s / 10.
"""

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from detectorfreesfm_tpu.models.loftr import DetectorFreeMatcher, MatcherConfig

BASELINE_PAIRS_PER_S = 10.0


def _tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Probe TPU backend init in a SUBPROCESS. The axon relay can wedge so
    that PJRT client creation blocks forever inside jax.devices(); probing
    in-process would hang this bench (and deadlock any later backend init on
    xla_bridge's lock). On timeout we fall back to the CPU smoke metric
    instead of hanging the driver."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return out.returncode == 0 and "tpu" in out.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    tpu_down = not _tpu_reachable()
    if tpu_down:
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    size = 832 if on_tpu else 128
    batch = 16 if on_tpu else 2
    iters = 10 if on_tpu else 2
    cfg = MatcherConfig(
        compute_dtype="bfloat16" if on_tpu else "float32",
        max_matches=2048 if on_tpu else 128,
        fused_matching=on_tpu,  # Pallas fused dual-softmax on real hardware
    )
    model = DetectorFreeMatcher(cfg)
    rng = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(rng, (batch, size, size, 1), jnp.float32)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), img0.shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(2), img0[:1], img1[:1])

    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))

    def sync(out):
        # device_get of a dependent scalar forces completion even on async
        # tunnel transports where block_until_ready returns early
        return float(jax.device_get(out.conf.sum()))

    sync(fwd(params, img0, img1))  # compile + warm
    sync(fwd(params, img0, img1))
    # Throughput protocol: launch all iterations, sync once. Per-iteration
    # syncing would charge the transport round-trip (~30 ms on the dev
    # tunnel) to every batch; the production engine pipelines dispatches
    # (match/engine.py), so throughput is the faithful metric.
    t0 = time.perf_counter()
    outs = [fwd(params, img0, img1) for _ in range(iters)]
    for o in outs:
        sync(o)
    dt = time.perf_counter() - t0
    pairs_per_s = batch * iters / dt

    rec = {
        "metric": "coarse_matched_pairs_per_s" + ("" if on_tpu else "_cpu_smoke"),
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
    }
    if on_tpu:
        # ETH3D-resolution bucket (img_resize 1600 — the reference's ETH3D
        # protocol, hydra_configs/eth3d_sfm/dfsfm.yaml:77). Round-1 measured
        # 8.9 pairs/s; recorded alongside the headline 832 px metric
        # (VERDICT r2 #2). Secondary field, not the headline value.
        s16, b16, it16 = 1600, 8, 4
        i0 = jax.random.uniform(rng, (b16, s16, s16, 1), jnp.float32)
        i1 = jax.random.uniform(jax.random.PRNGKey(3), i0.shape, jnp.float32)
        sync(fwd(params, i0, i1))
        sync(fwd(params, i0, i1))
        t0 = time.perf_counter()
        outs = [fwd(params, i0, i1) for _ in range(it16)]
        for o in outs:
            sync(o)
        rec["pairs_per_s_1600px"] = round(
            b16 * it16 / (time.perf_counter() - t0), 3)
        rec["vs_round1_1600px"] = round(rec["pairs_per_s_1600px"] / 8.9, 3)
    if tpu_down:
        # Not a regression: the axon relay refused/never granted a chip, so
        # this run measured the CPU smoke config (see _tpu_reachable).
        rec["tpu_unreachable"] = True
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
