"""Host-level work distribution: chunkers + scene queue + progress.

The role of the reference's Ray utilities (src/utils/ray_utils.py:12-134 —
chunkers, balanced splits, progress actor) in a TPU-pod world: scenes are
distributed over *processes* (one per host, `jax.process_index()`); inside a
process, work shards over the local device mesh. Deterministic by
construction (no shuffled chunk indices — SURVEY.md §5 lists the reference's
shuffles as a non-determinism source to kill).
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Dict, Iterable, List, Optional, Sequence, TypeVar

T = TypeVar("T")


def chunks(items: Sequence[T], n_per_chunk: int) -> List[List[T]]:
    """Fixed-size contiguous chunks (reference ray_utils.chunks:88)."""
    return [
        list(items[i : i + n_per_chunk])
        for i in range(0, len(items), n_per_chunk)
    ]


def chunks_balance(items: Sequence[T], n_chunks: int) -> List[List[T]]:
    """Round-robin split into n_chunks near-equal parts
    (reference chunks_balance:101); deterministic order."""
    out: List[List[T]] = [[] for _ in range(max(n_chunks, 1))]
    for i, it in enumerate(items):
        out[i % max(n_chunks, 1)].append(it)
    return out


def chunk_index(n: int, n_per_chunk: int) -> List[List[int]]:
    return chunks(list(range(n)), n_per_chunk)


def chunk_index_balance(n: int, n_chunks: int) -> List[List[int]]:
    return chunks_balance(list(range(n)), n_chunks)


def split_dict(d: Dict, n_chunks: int) -> List[Dict]:
    keys = sorted(d)
    return [
        {k: d[k] for k in part} for part in chunks_balance(keys, n_chunks)
    ]


def local_shard(items: Sequence[T], process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> List[T]:
    """This process's strided share of a global work list."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items[pi::pc])


class Progress:
    """Plain-stderr progress meter (the Ray actor + tqdm poll loop collapses
    to a local counter once workers are SPMD shards, not actors)."""

    def __init__(self, total: int, desc: str = "", report_every: float = 5.0):
        self.total = total
        self.desc = desc
        self.done = 0
        self._last = 0.0
        self._t0 = time.time()
        self.report_every = report_every

    def update(self, n: int = 1):
        self.done += n
        now = time.time()
        if now - self._last >= self.report_every or self.done >= self.total:
            rate = self.done / max(now - self._t0, 1e-9)
            print(
                f"[{self.desc}] {self.done}/{self.total} ({rate:.2f}/s)",
                file=sys.stderr,
            )
            self._last = now


def run_scenes(
    scene_fn: Callable[[T], Dict],
    scenes: Sequence[T],
    on_error: str = "log",  # "log" | "raise"
) -> Dict[str, Dict]:
    """Run scenes serially on this process with per-scene crash isolation
    (reference eval_dataset.py:88-92 catches and logs worker exceptions)."""
    results: Dict[str, Dict] = {}
    prog = Progress(len(scenes), desc="scenes")
    for s in scenes:
        key = str(s)
        try:
            results[key] = scene_fn(s)
        except Exception as e:  # noqa: BLE001
            if on_error == "raise":
                raise
            print(f"scene {key} failed: {e!r}", file=sys.stderr)
            results[key] = {"status": "failed", "error": repr(e)}
        prog.update()
    return results


def allgather_objects(obj):
    """All-gather one picklable-as-JSON object per process (the reference's
    gloo `gather` of pickled metrics, src/utils/comm.py, used at
    lightning_model.py:137-152). Serializes to a padded uint8 buffer and
    rides jax.experimental.multihost_utils.process_allgather over DCN.
    Returns a list with one object per process (all processes get all)."""
    import json

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(json.dumps(obj).encode(), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([len(data)], np.int32)
    ).reshape(-1)
    m = int(sizes.max())
    buf = np.zeros(m, np.uint8)
    buf[: len(data)] = data
    bufs = multihost_utils.process_allgather(buf).reshape(-1, m)
    return [
        json.loads(bytes(bufs[p, : sizes[p]]).decode())
        for p in range(len(sizes))
    ]


def run_eval_scenes(scenes, scene_fn, output_dir: str,
                    imc_bags: bool = False, title: str = "dataset"):
    """Multi-host dataset evaluation driver (reference eval_dataset.py's Ray
    scene fan-out, :129-151, as a process-strided queue): each process
    reconstructs its strided shard exactly once, per-scene metrics are
    all-gathered over DCN, and process 0 writes the aggregated metrics.txt.

    scene_fn(scene_name) -> result dict (keys: status, n_registered,
    n_images, pose_auc?). Returns (per_scene_metrics, report) on process 0
    and (None, None) elsewhere."""
    import json as _json
    import os

    import jax

    from ..eval.aggregate import aggregate_multi_scene_metrics, format_report

    import time as _time

    pc = jax.process_count()
    mine = local_shard(scenes) if pc > 1 else list(scenes)
    local: Dict[str, Dict] = {}
    for s in mine:
        print(f"=== scene {s} (proc {jax.process_index()}) ===",
              file=sys.stderr)
        t0 = _time.perf_counter()
        try:
            res = scene_fn(s)
        except Exception as e:  # noqa: BLE001 — per-scene isolation
            print(f"scene {s} failed: {e}", file=sys.stderr)
            res = {"status": "failed", "error": repr(e)}
        dt = _time.perf_counter() - t0
        print(_json.dumps({"scene": s, "wall_s": round(dt, 1), **res}))
        metrics = dict(res.get("pose_auc", {}) or {})
        metrics["registered_ratio"] = (
            res.get("n_registered", 0) / max(res.get("n_images", 1), 1)
        )
        # Scene-level throughput (BASELINE.md north-star protocol needs
        # scenes/hour; the first scene of a process carries the compile
        # cost, later ones reflect the warm steady state).
        metrics["wall_s"] = round(dt, 1)
        local[s] = metrics
    gathered = allgather_objects(local)
    per_scene: Dict[str, Dict] = {}
    for d in gathered:
        per_scene.update(d)
    if jax.process_index() != 0:
        return None, None
    agg = aggregate_multi_scene_metrics(per_scene, group_bags=imc_bags)
    report = format_report(agg, per_scene, title=title)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "metrics.txt"), "w") as f:
        f.write(report + "\n")
    print(report)
    return per_scene, report
