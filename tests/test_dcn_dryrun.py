"""Multi-host (DCN) orchestration dryrun as a CI test.

Spawns tools/dryrun_dcn.py: two OS processes x 4 virtual CPU devices form an
8-device global mesh via jax.distributed (gloo over local TCP), exercising
the scene queue (local_shard/run_scenes) and cross-process collectives —
the reference's Ray/SLURM multi-node path (eval_dataset.py:129-151) mapped
to jax.distributed (SURVEY.md §2.4).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dcn_dryrun():
    env = dict(os.environ)
    # CPU-only workers: keep the TPU plugin (PYTHONPATH sitecustomize) out
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # Must not inherit this process's forced 8-device CPU flag
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_dcn.py")],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    assert "DCN dryrun: OK" in p.stdout
