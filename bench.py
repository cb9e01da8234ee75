"""Benchmark: matched pairs/s for the detector-free coarse matcher.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: batch of image pairs at the demo bucket (832x832 padded frame,
the reference demo config's img_resize 840 snapped to the /8 grid —
hydra_configs/demo/dfsfm.yaml), full coarse forward (ResNetFPN backbone +
4x(self,cross) linear-attention transformer + dual-softmax top-K extraction),
bf16 on TPU. Baseline: the reference's LoFTR coarse-only matcher sustains
~10 pairs/s at this resolution on one V100-class GPU (bs=1 loop,
src/coarse_match/coarse_match_worker.py:86); vs_baseline = pairs_per_s / 10.

Timeout-proofing (VERDICT r3 #4 — round 3's driver bench rc=124, zero
numbers captured): every TPU measurement runs in its OWN subprocess with a
wall-clock bound inside a global budget (BENCH_BUDGET_S, default 480 s).
The headline 832 px bucket runs first; the secondary 1600 px bucket only
runs with the budget that remains and is skipped (flagged, not fatal) when
compile blows its slice. The final JSON line is always printed.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_PAIRS_PER_S = 10.0


def _measure_bucket(size: int, batch: int, iters: int) -> float:
    """Run one resolution bucket on the default backend. Child-process
    entry (`bench.py --bucket SIZE`); prints a single JSON line."""
    import jax
    import jax.numpy as jnp

    from detectorfreesfm_tpu.models.loftr import (
        DetectorFreeMatcher, MatcherConfig,
    )

    cfg = MatcherConfig(
        compute_dtype="bfloat16",
        max_matches=2048,
        # Mirror the production auto-select (cli.py): dense conf + XLA
        # softmax up to ~12k coarse tokens (faster at 832 px, measured
        # 74.4 vs 67.2 pairs/s round 4), fused Pallas streaming above
        # (the only path that can allocate at 1600 px).
        fused_matching=(size // 8) ** 2 > 12000,
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
    return batch * iters / dt


def _run_bucket_subprocess(size: int, batch: int, iters: int,
                           timeout_s: float):
    """One bucket in a bounded subprocess: a wedged compile/relay costs its
    slice of the budget, never the whole bench. Returns pairs/s or None."""
    if timeout_s < 30:
        return None
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--bucket",
             str(size), str(batch), str(iters)],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    if out.returncode != 0:
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["pairs_per_s"])
        except (ValueError, KeyError):
            continue
    return None


def _tpu_reachable(timeout_s: float = 120.0) -> bool:
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


def _cpu_smoke_impl() -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from detectorfreesfm_tpu.models.loftr import (
        DetectorFreeMatcher, MatcherConfig,
    )

    model = DetectorFreeMatcher(MatcherConfig(
        compute_dtype="float32", max_matches=128, fused_matching=False))
    rng = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(rng, (2, 128, 128, 1), jnp.float32)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), img0.shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(2), img0[:1], img1[:1])
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))
    float(jax.device_get(fwd(params, img0, img1).conf.sum()))
    t0 = time.perf_counter()
    for _ in range(2):
        o = fwd(params, img0, img1)
    float(jax.device_get(o.conf.sum()))
    return 2 * 2 / (time.perf_counter() - t0)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--bucket":
        size, batch, iters = (int(a) for a in sys.argv[2:5])
        print(json.dumps(
            {"pairs_per_s": round(_measure_bucket(size, batch, iters), 3)}))
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    deadline = time.monotonic() + budget

    def remaining():
        return deadline - time.monotonic()

    tpu_up = _tpu_reachable(timeout_s=min(120.0, remaining()))
    rec = None
    if tpu_up:
        # Headline bucket first, on its own clock — worst case it costs
        # min(360, remaining) and the 1600 bucket absorbs the loss.
        v832 = _run_bucket_subprocess(
            832, 16, 10, timeout_s=min(300.0, remaining() - 30.0))
        if v832 is not None:
            rec = {
                "metric": "coarse_matched_pairs_per_s",
                "value": v832,
                "unit": "pairs/s",
                "vs_baseline": round(v832 / BASELINE_PAIRS_PER_S, 3),
            }
            # ETH3D-resolution bucket (img_resize 1600 — the reference's
            # ETH3D protocol, hydra_configs/eth3d_sfm/dfsfm.yaml:77).
            # Secondary field; skipped (not fatal) when the budget is gone.
            v1600 = _run_bucket_subprocess(
                1600, 8, 4, timeout_s=remaining() - 10.0)
            if v1600 is not None:
                rec["pairs_per_s_1600px"] = v1600
                rec["vs_round1_1600px"] = round(v1600 / 8.9, 3)
            else:
                rec["pairs_per_s_1600px"] = None
                rec["note_1600"] = "skipped: bucket budget exhausted"
    if rec is None:
        # Not a regression: the axon relay refused/never granted a chip (or
        # the TPU bucket itself timed out) — measure the CPU smoke config
        # so the driver still records a structured result.
        v = _cpu_smoke_impl()
        rec = {
            "metric": "coarse_matched_pairs_per_s_cpu_smoke",
            "value": round(v, 3),
            "unit": "pairs/s",
            "vs_baseline": round(v / BASELINE_PAIRS_PER_S, 3),
            "tpu_unreachable": True,
        }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
