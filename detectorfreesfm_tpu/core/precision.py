"""Matmul-precision control for geometry code.

The axon TPU runs f32 matmuls as bf16 passes by default; geometry
estimation (8-point/DLT normal matrices, Gauss-Newton steps, Schur
reductions) visibly loses registrations/convergence at bf16. Wrapping the
to-be-jitted function forces HIGHEST precision for every dot traced
inside, while neural nets elsewhere keep the fast default.
"""

from __future__ import annotations

import functools

import jax


def with_highest_matmul_precision(fn):
    """Apply between @jax.jit and the def: trace under HIGHEST precision."""

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped
