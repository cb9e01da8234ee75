"""RANSAC outcomes must be invariant to the visible device count.

VERDICT r2 weak #2 / task #4: with a sequential RNG stream, mesh-size-
dependent batching perturbed every pair's randomness — the demo scene
flipped 8/8 -> 7/8 between 1 and 8 virtual devices. Keys are now derived
from per-entity content hashes (sfm/mapper.py::_stable_rngs), so the same
scene must verify and map identically at 1, 2, and 8 devices."""

import json
import os
import subprocess
import sys

DRIVER = os.path.join(os.path.dirname(__file__), "run_ransac_invariance.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(n_devices: int) -> dict:
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_devices}",
    })
    out = subprocess.run(
        [sys.executable, DRIVER], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_ransac_invariant_to_device_count():
    runs = {n: _run(n) for n in (1, 2, 8)}
    assert runs[1]["n_devices"] == 1 and runs[8]["n_devices"] == 8
    base = runs[1]
    for n in (2, 8):
        r = runs[n]
        assert r["pairs"] == base["pairs"], (
            f"verification differs at {n} devices")
        assert r["registered"] == base["registered"]
        assert r["n_points"] == base["n_points"]
