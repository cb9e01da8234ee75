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


def _geometry_device_ctx():
    if os.environ.get("DFSFM_GEOMETRY_DEVICE", "cpu") != "cpu":
        return contextlib.nullcontext()
    if getattr(_tls, "no_cpu_hop", False):
        return contextlib.nullcontext()
    try:
        if jax.default_backend() == "cpu":
            return contextlib.nullcontext()
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:  # noqa: BLE001 — placement is an optimization
        return contextlib.nullcontext()


def with_highest_matmul_precision(fn):
    """Apply between @jax.jit and the def: trace under HIGHEST precision
    (and, on accelerator-default processes, run on the host CPU backend)."""

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with _geometry_device_ctx(), \
                jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped
