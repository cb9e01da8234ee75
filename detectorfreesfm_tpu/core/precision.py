"""Matmul-precision and device-placement control for geometry code.

Precision: the axon TPU runs f32 matmuls as bf16 passes by default;
geometry estimation (8-point/DLT design matrices, Gauss-Newton steps,
Schur reductions) visibly loses registrations/convergence at bf16.
Wrapping the to-be-jitted function forces HIGHEST precision for every dot
traced inside, while neural nets elsewhere keep the fast default.

Placement (round-5 policy). Accuracy no longer forces a device: round 5
root-caused and fixed the round-4 TPU-geometry failures (see
sfm/twoview.py — eager-bf16 homography decomposition, cheirality-tied
plane solutions, eigh-of-normal-matrix solvers) and the 10-scene parity
sweep shows CPU == accel AUC (tools/parity_sweep.py, RESULTS_r05.md §1).
Placement is now purely a PERFORMANCE choice, measured per kernel class
(tools/bench_geometry_placement.py, one chip over the axon tunnel):

  * batched RANSAC sweeps      accel 0.11-0.12x of CPU time  -> accel
  * batched DLT triangulation  accel 0.35-0.44x              -> accel
  * bundle_adjust LM loop      accel 2.7x at C=50, 0.65x at C=300
    (host-driven iteration: dispatch latency dominates small problems)

DFSFM_GEOMETRY_DEVICE modes:
  "auto" (default) — batch kernels (*_batch, triangulate_dlt) on the
      accelerator; host-latency-bound kernels (single-pair solves, BA LM
      steps) on host CPU unless the BA driver signals a large problem via
      prefer_accelerator_geometry() (C >= ~150: the Schur solve amortizes
      the dispatches).
  "cpu"   — everything on host CPU (old round-4 behavior).
  "accel" — everything on the accelerator.
The mesh-sharded BA path keeps its explicit TPU shardings via
keep_geometry_on_default_device(); DFSFM_GEOMETRY_ACCEL_ONLY=<names>
moves an explicit kernel list to the accelerator (bisection tool).
"""

from __future__ import annotations

import contextlib
import functools
import os
import threading

import jax

_tls = threading.local()


@contextlib.contextmanager
def keep_geometry_on_default_device():
    """Inside this context, geometry jits do NOT hop to CPU (used by the
    mesh-sharded BA path whose inputs carry explicit TPU shardings)."""
    prev = getattr(_tls, "no_cpu_hop", False)
    _tls.no_cpu_hop = True
    try:
        yield
    finally:
        _tls.no_cpu_hop = prev


@contextlib.contextmanager
def prefer_accelerator_geometry(enable: bool = True):
    """Hint from a host driver (bundle_adjust) that the upcoming geometry
    work is large enough to amortize accelerator dispatch latency — in
    "auto" mode the wrapped kernels then stay on the default device."""
    prev = getattr(_tls, "prefer_accel", False)
    _tls.prefer_accel = bool(enable)
    try:
        yield
    finally:
        _tls.prefer_accel = prev


# Kernels whose batched shape profile measured faster on the accelerator at
# every realistic size (tools/bench_geometry_placement.py) — "auto" mode
# keeps these on the default device.
_BATCH_KERNELS = frozenset({
    "estimate_relative_pose_batch",
    "estimate_homography_batch",
    "estimate_absolute_pose_batch",
    "triangulate_dlt",
})


def _geometry_device_ctx(name: str | None = None):
    mode = os.environ.get("DFSFM_GEOMETRY_DEVICE", "auto")
    if mode not in ("cpu", "auto"):
        return contextlib.nullcontext()
    # Per-kernel bisection/override: comma-separated kernel names that stay
    # on the accelerator while everything else hops (diagnostic tool for
    # tracking down device-accuracy divergences kernel by kernel).
    accel_only = os.environ.get("DFSFM_GEOMETRY_ACCEL_ONLY", "")
    if accel_only and name is not None and name in {
        s.strip() for s in accel_only.split(",")
    }:
        return contextlib.nullcontext()
    if mode == "auto" and (
        name in _BATCH_KERNELS or getattr(_tls, "prefer_accel", False)
    ):
        return contextlib.nullcontext()
    if getattr(_tls, "no_cpu_hop", False):
        return contextlib.nullcontext()
    try:
        if jax.default_backend() == "cpu":
            return contextlib.nullcontext()
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:  # noqa: BLE001 — placement is an optimization
        return contextlib.nullcontext()


def _to_host(x):
    """Move an accelerator-resident array to the CPU backend. Computation
    follows device-resident inputs regardless of default_device, so the
    CPU hop must relocate them explicitly (call sites often jnp.asarray
    their numpy before the call, which lands on the accelerator)."""
    if isinstance(x, jax.Array):
        try:
            if all(d.platform == "cpu" for d in x.devices()):
                return x
            return jax.device_put(x, jax.local_devices(backend="cpu")[0])
        except Exception:  # noqa: BLE001 — placement is an optimization
            return x
    return x


def with_highest_matmul_precision(fn):
    """Apply between @jax.jit and the def: trace under HIGHEST precision.

    NOTE: this runs INSIDE the jit trace, so it can only annotate dot
    precision — it cannot change placement (the outer jit has already
    picked a device before tracing). Use geometry_jit for full
    precision + CPU-placement treatment."""

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped


def geometry_jit(**jit_kwargs):
    """jax.jit for geometry kernels: traces under HIGHEST matmul precision
    AND (on accelerator-default processes) moves inputs to the host CPU
    backend and runs there — placement must be decided OUTSIDE the jit,
    and device-resident inputs must be relocated explicitly because
    computation follows data regardless of default_device."""

    def deco(fn):
        jfn = jax.jit(with_highest_matmul_precision(fn), **jit_kwargs)
        kernel_name = fn.__name__

        @functools.wraps(fn)
        def outer(*a, **k):
            ctx = _geometry_device_ctx(kernel_name)
            if not isinstance(ctx, contextlib.nullcontext):
                a, k = jax.tree_util.tree_map(_to_host, (a, k))
            with ctx:
                return jfn(*a, **k)

        return outer

    return deco
