#!/usr/bin/env python
"""Two-process DCN dryrun: multi-host orchestration over jax.distributed.

Proves the multi-host path of SURVEY.md §2.4 / BASELINE.md (the reference
runs multi-node via Ray/SLURM — eval_dataset.py:129-151) without real hosts:
two OS processes, each with 4 virtual CPU devices, form one 8-device global
mesh through `jax.distributed.initialize` (DCN = local TCP).

Exercised per process:
  1. host-level scene queue — `local_shard` + `run_scenes` splits scene work
     by `jax.process_index()` (the Ray scene fan-out equivalent);
  2. one cross-process data-parallel BA observation reduction — a jitted
     psum over the global mesh; every process must compute the identical
     global value (the collective really crossed the process boundary);
  3. a global-mesh matcher train step shape check via shard_map-free
     jit with NamedSharding over the global device list.

Usage:  python tools/dryrun_dcn.py            (parent; spawns 2 workers)
        BENCHMARKS.md documents this as the multi-host CI check.
Exit code 0 = both processes agree on all cross-process results.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int, nproc: int, port: int) -> int:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from detectorfreesfm_tpu.parallel.orchestrate import local_shard, run_scenes

    assert jax.process_count() == nproc
    n_global = len(jax.devices())
    assert n_global == 4 * nproc, n_global

    # --- 1. host-level scene queue (strided by process) --------------------
    scenes = [f"scene_{i:02d}" for i in range(7)]
    mine = local_shard(scenes)
    res = run_scenes(lambda s: {"status": "ok", "scene": s}, mine)
    assert all(r["status"] == "ok" for r in res.values())
    expect = scenes[pid::nproc]
    assert sorted(res) == sorted(expect), (sorted(res), expect)

    # --- 2. cross-process BA-style reduction -------------------------------
    # Each process contributes its own observation block; the jitted global
    # program must reduce over BOTH processes' shards.
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global, 1),
                ("data", "model"))
    obs = np.arange(n_global * 8, dtype=np.float64).reshape(n_global * 8, 1)
    sharding = NamedSharding(mesh, P("data"))
    # Build the globally-sharded array from per-process local shards
    # (device .id values are not globally dense — use position in
    # jax.devices() order, which is the mesh order)
    globpos = {d.id: i for i, d in enumerate(jax.devices())}
    local_rows = obs.reshape(n_global, 8)[
        [globpos[d.id] for d in jax.local_devices()]
    ].reshape(-1, 1)
    garr = jax.make_array_from_process_local_data(sharding, local_rows)

    @jax.jit
    def reduce_sq(x):
        return jnp.sum(x * x)

    total = float(reduce_sq(garr))
    expected = float(np.sum(obs * obs))
    assert abs(total - expected) < 1e-6, (total, expected)

    # --- 3. replicated-parameter global step -------------------------------
    repl = NamedSharding(mesh, P())
    w = jax.device_put(jnp.ones((4, 4)), repl)

    @jax.jit
    def step(w, x):
        g = jnp.einsum("nd,df->nf", x, w)
        return jnp.sum(g)

    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.ones((len(jax.local_devices()) * 2, 4), np.float32),
    )
    v = float(step(w, x))
    # global x is (n_global*2, 4) of ones; g = x @ w has every element 4
    assert abs(v - n_global * 2 * 4 * 4) < 1e-5, v

    # --- 4. two-process mini eval-dataset ----------------------------------
    # The production multi-host dataset driver (cli.cmd_eval_dataset ->
    # parallel.orchestrate.run_eval_scenes): every scene must be evaluated
    # by EXACTLY ONE process, per-scene metrics all-gather over DCN, and
    # process 0 writes one merged metrics.txt (VERDICT r2 #7; reference
    # eval_dataset.py:129-151 Ray fan-out).
    import json
    import tempfile

    from detectorfreesfm_tpu.parallel.orchestrate import run_eval_scenes

    out_dir = os.path.join(tempfile.gettempdir(), f"dcn_eval_{port}")
    ran = []

    def scene_fn(s):
        ran.append(s)
        return {
            "status": "ok", "n_registered": 7, "n_images": 8,
            "pose_auc": {"auc@5": 0.5 + 0.01 * int(s[-2:])},
        }

    eval_scenes = [f"scene_{i:02d}" for i in range(5)]
    per_scene, _report = run_eval_scenes(
        eval_scenes, scene_fn, out_dir, title="dcn_dryrun")
    # disjoint, complete ownership: this process ran exactly its stride
    assert ran == eval_scenes[pid::nproc], (ran, pid)
    if pid == 0:
        assert per_scene is not None and sorted(per_scene) == eval_scenes
        with open(os.path.join(out_dir, "metrics.txt")) as f:
            rep = f.read()
        for s in eval_scenes:  # merged report covers every scene
            assert s in rep, s
    else:
        assert per_scene is None

    print(f"[proc {pid}] scene shard {expect} | global reduce {total:.0f} "
          f"| step {v:.0f} | eval-dataset shard {ran} OK", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        return worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))

    port = 29671
    nproc = 2
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)        # keep the TPU relay out of CPU workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), str(nproc), str(port)],
            env=env,
        )
        for i in range(nproc)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    ok = all(c == 0 for c in codes)
    print("DCN dryrun:", "OK" if ok else f"FAILED {codes}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
