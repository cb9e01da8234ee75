"""Matmul-precision and device-placement control for geometry code.

Precision: the axon TPU runs f32 matmuls as bf16 passes by default;
geometry estimation (8-point/DLT normal matrices, Gauss-Newton steps,
Schur reductions) visibly loses registrations/convergence at bf16.
Wrapping the to-be-jitted function forces HIGHEST precision for every dot
traced inside, while neural nets elsewhere keep the fast default.

Placement: on single-chip TPU runs the geometry kernels additionally hop
to the HOST CPU backend (round-4 measurement: the same cached matches
through the same mapper give coarse AUC@5 0.77 on CPU vs 0.03 through the
TPU path on a planar-degenerate scene — f32 eigh/iterative decompositions
on ill-conditioned normal matrices are far less accurate on TPU than
LAPACK, and no matmul-precision flag fixes that). These are small-matrix
batched ops that also pay ~10-30 ms tunnel latency per dispatch on TPU —
CPU is both the accurate and the fast home. Neural forwards (matcher,
refiner) stay on TPU. Opt out with DFSFM_GEOMETRY_DEVICE=accel, and the
mesh-sharded BA path keeps its explicit TPU shardings via
keep_geometry_on_default_device().
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


def _geometry_device_ctx(name: str | None = None):
    if os.environ.get("DFSFM_GEOMETRY_DEVICE", "cpu") != "cpu":
        return contextlib.nullcontext()
    # Per-kernel bisection/override: comma-separated kernel names that stay
    # on the accelerator while everything else hops (diagnostic tool for
    # tracking down device-accuracy divergences kernel by kernel).
    accel_only = os.environ.get("DFSFM_GEOMETRY_ACCEL_ONLY", "")
    if accel_only and name is not None and name in {
        s.strip() for s in accel_only.split(",")
    }:
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
