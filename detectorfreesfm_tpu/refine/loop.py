"""Iterative refinement driver: multiview matching + geometry refinement.

Replaces the reference's post_optimization loop + custom COLMAP verb
`incremental_model_refiner` (src/post_optimization/post_optimization.py:56-208,
src/sfm_runner/sfm_model_geometry_refiner.py): per iteration,

  1. pack all tracks into bags and refine every query node's 2D location
     with the MultiviewRefiner (window shrinks per iteration, 15 -> 11 -> 7,
     the reference's rewindow_size_factor);
  2. write refined keypoints back into the reconstruction (each refined
     observation updates its image's xys row, the reference's
     update_refined_kpts_to_colmap_multiview);
  3. geometry refinement: global BA with the farthest registered pair as
     gauge (write_fixed_images.py fix_farest_images), observation completion,
     and reproj/angle filtering at per-iteration thresholds [3, 2, 1.5] px;
  4. re-register dropped images on even iterations.

All neural work runs as ONE flat scene-wide track table (refine/bags.py::
pack_track_table) chunked and sharded over the device mesh; the loop itself
is host logic. Cross-bag reference-point consistency (the reference's
UpdatedQueryPts / query_movable_mask buffer, multiview_match_worker.py:85-110)
is structural here: every 3D point is exactly one table row (a keypoint maps
to at most one point), so a reference point is refined exactly once per
iteration and no later batch can observe stale coordinates.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import np_quat_to_rotmat
from ..models.multiview_matcher import MultiviewRefiner, RefinerConfig
from ..parallel.mesh import get_mesh, pad_to_multiple, replicate, shard_leading_axis
from ..sfm.mapper import IncrementalMapper, MapperConfig
from ..sfm.reconstruction import Reconstruction
from .bags import pack_track_table


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    n_iters: int = 2
    windows: tuple = (15, 11, 7)       # per-iteration attention window
    crop_extra: int = 4                # backbone context beyond the window
    filter_thresholds: tuple = (3.0, 2.0, 1.5)  # px, per iteration; also the
                                       # tri-merge / tri-complete thresholds
                                       # (reference geometry refiner sets all
                                       # three to the same value per iter)
    min_tri_angle_deg: float = 1.5
    max_track_length: int = 16
    max_imgs_per_bag: int = 16
    chunk_tracks: int = 512
    reregister_every: int = 2
    # Relaxed re-registration thresholds (reference reregistration.py:35-46 +
    # hydra_configs/*/dfsfm.yaml `reregistration:`— a separate, looser config
    # than the mapper's so refinement-dropped images can come back)
    rereg_abs_pose_max_error: float = 20.0  # reference reregistration.py:37
    rereg_min_num_inliers: int = 15
    rereg_min_inlier_ratio: float = 0.1
    # Refinement with freshly-initialized (random) refiner weights only
    # perturbs keypoints and relies on the filter to claw back — never what
    # a user wants in production. Tests/bootstrap opt in explicitly.
    allow_random_weights: bool = False
    # Triangulation mode: known GT poses stay frozen through refinement BA
    # (reference post_optimization.py:183-187 fix_all_images when
    # refine_3D_pts_only) and PnP re-registration is skipped.
    fix_all_poses: bool = False
    compute_dtype: str = "float32"
    save_iters_to: str | None = None  # write model_refined_{i}/ per iteration
                                      # (reference post_optimization artifact)


def _farthest_pair(rec: Reconstruction) -> set:
    reg = rec.registered_images
    if len(reg) < 2:
        return set(reg)
    # Batched numpy C = -R^T t (per-image eager jnp camera_center calls cost
    # ~ms each; see core.geometry.np_quat_to_rotmat).
    q = np.stack([rec.images[i].qvec for i in reg])
    t = np.stack([rec.images[i].tvec for i in reg])
    R = np_quat_to_rotmat(np.asarray(q, np.float64))
    C = -np.einsum("nji,nj->ni", R, t)
    d2 = np.sum((C[:, None] - C[None, :]) ** 2, axis=-1)
    a, b = np.unravel_index(int(np.argmax(d2)), d2.shape)
    return {reg[a], reg[b]}


def _pad_tracks(arr: np.ndarray, t_pad: int, fill=0):
    if len(arr) == t_pad:
        return arr
    pad = np.full((t_pad - len(arr),) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad])


def refine_reconstruction(
    rec: Reconstruction,
    images_by_id: Dict[int, np.ndarray],   # image_id -> (H, W) float [0,1]
    params=None,
    cfg: RefineConfig = RefineConfig(),
    mapper: Optional[IncrementalMapper] = None,
    rng: Optional[jax.Array] = None,
    verbose: bool = False,
) -> Reconstruction:
    """Refine a reconstruction in place (also returned).

    images_by_id carries full-resolution grayscale images; all bag images are
    padded to the max (H, W) in the bag so one compile serves a scene.
    """
    import copy

    from ..utils.profiler import PassThroughProfiler

    if params is None and not cfg.allow_random_weights:
        raise ValueError(
            "refine_reconstruction called without refiner weights: pass "
            "params=<trained MultiviewRefiner params> (e.g. "
            "weights/demo_refiner_r4_bf16.msgpack via --refiner-ckpt), or "
            "opt in to random weights with "
            "RefineConfig(allow_random_weights=True)."
        )

    profiler = PassThroughProfiler()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    Hmax = max(im.shape[0] for im in images_by_id.values())
    Wmax = max(im.shape[1] for im in images_by_id.values())

    # Stage the whole scene's images to device ONCE (replicated over the
    # mesh): track rows then index into this global stack, so refinement has
    # no per-bag image shuffling and no image-count-dependent recompiles.
    mesh = get_mesh()
    image_order = sorted(images_by_id)
    img_stack = np.zeros((len(image_order), Hmax, Wmax, 1), np.float32)
    for gi, img_id in enumerate(image_order):
        a = images_by_id[img_id]
        img_stack[gi, : a.shape[0], : a.shape[1], 0] = a
    images_dev = replicate(jnp.asarray(img_stack), mesh)

    for it in range(cfg.n_iters):
        # Failure isolation (reference post_optimization.py:195-197: a failed
        # geometry-refinement iteration falls back to the unrefined model)
        snapshot = copy.deepcopy((
            {i: (im.qvec.copy() if im.registered else None,
                 im.tvec.copy() if im.registered else None,
                 im.xys.copy(), im.point3D_ids.copy())
             for i, im in rec.images.items()},
            {p: {"xyz": pt["xyz"].copy(), "track": list(pt["track"])}
             for p, pt in rec.points.items()},
        ))
        try:
            _refine_iteration(
                rec, images_dev, image_order, params, cfg, mapper, rng,
                verbose, it, mesh, profiler,
            )
            if cfg.save_iters_to:
                import os

                d = os.path.join(cfg.save_iters_to, f"model_refined_{it}")
                os.makedirs(d, exist_ok=True)
                rec.write(d)
        except Exception as e:  # noqa: BLE001
            if verbose:
                print(f"refine iter {it} failed ({e!r}); keeping previous model")
            img_snap, pt_snap = snapshot
            for i, (q, t, xys, pids) in img_snap.items():
                im = rec.images[i]
                im.qvec, im.tvec = q, t
                im.xys, im.point3D_ids = xys, pids
            rec.points = {
                p: {"xyz": d["xyz"], "rgb": rec.points.get(p, {}).get(
                    "rgb", np.array([128, 128, 128], np.uint8)),
                    "error": -1.0, "track": d["track"]}
                for p, d in pt_snap.items()
            }
            break
    return rec


def _refine_iteration(
    rec, images_dev, image_order, params, cfg, mapper, rng, verbose, it,
    mesh, profiler,
):
    window = cfg.windows[min(it, len(cfg.windows) - 1)]
    rcfg = RefinerConfig(
        crop_size=window + cfg.crop_extra, window=window,
        compute_dtype=cfg.compute_dtype,
    )
    model = MultiviewRefiner(rcfg)
    model_params = params
    if model_params is None:
        model_params = model.init(
            rng, jnp.zeros((1, 32, 32, 1), jnp.float32),
            jnp.zeros((1, cfg.max_track_length), jnp.int32),
            jnp.full((1, cfg.max_track_length, 2), 16.0, jnp.float32),
            jnp.ones((1, cfg.max_track_length), jnp.float32),
            jnp.zeros((1, cfg.max_track_length), bool),
        )
    params_dev = replicate(model_params, mesh)
    apply = jax.jit(model.apply)

    with profiler.record_function("refine/pack_tracks"):
        table = pack_track_table(rec, max_track_length=cfg.max_track_length)
    # Reconcile table image indices with the staged global stack
    img_pos = {img_id: gi for gi, img_id in enumerate(image_order)}
    # Images never referenced by a node (e.g. unregistered) may be absent
    # from the staged stack; map them to 0 — their mask is always False.
    remap = np.asarray(
        [img_pos.get(i, 0) for i in table.image_ids], np.int32
    )
    node_img_g = remap[table.node_img]
    T_total = len(table.point_ids)
    n_dev = mesh.devices.size
    chunk = pad_to_multiple(max(cfg.chunk_tracks, n_dev), n_dev)
    if verbose:
        print(f"refine iter {it}: {T_total} tracks, window {window}, "
              f"chunks of {chunk} over {n_dev} devices")

    def dispatch(start):
        """Stage + launch one sharded track chunk (async)."""
        end = min(start + chunk, T_total)
        n = end - start
        ni = _pad_tracks(node_img_g[start:end], chunk)
        xy = _pad_tracks(table.node_xy[start:end], chunk)
        sc = _pad_tracks(table.node_scale[start:end], chunk, 1.0)
        mk = _pad_tracks(table.node_mask[start:end], chunk)
        batch = shard_leading_axis(
            (jnp.asarray(ni), jnp.asarray(xy), jnp.asarray(sc),
             jnp.asarray(mk)), mesh,
        )
        return start, n, apply(params_dev, images_dev, *batch)

    def collect(start, n, out):
        coords = np.asarray(out.coords)[:n]
        # Write refined query observations back into image keypoints
        for r in range(n):
            pid = table.point_ids[start + r]
            if pid not in rec.points:
                continue
            for vpos in range(1, coords.shape[1]):
                if not table.node_mask[start + r, vpos]:
                    continue
                img_id = table.image_ids[table.node_img[start + r, vpos]]
                kpt = int(table.node_kpt[start + r, vpos])
                rec.images[img_id].xys[kpt] = coords[r, vpos]

    # 1-deep software pipeline: host write-back of chunk i overlaps device
    # compute of chunk i+1 (same pattern as match/engine.py).
    with profiler.record_function("refine/multiview_match"):
        pending = None
        for start in range(0, T_total, chunk):
            nxt = dispatch(start)
            if pending is not None:
                collect(*pending)
            pending = nxt
        if pending is not None:
            collect(*pending)

    # Geometry refinement (the reference's custom COLMAP verb
    # incremental_model_refiner: retriangulate + merge + complete + BA +
    # filter, all at this iteration's threshold)
    m = mapper or IncrementalMapper(MapperConfig())
    if not hasattr(m, "names"):
        # allow running on a standalone reconstruction
        m.names = [im.name for im in rec.images.values()]
        m.name_to_id = {im.name: i for i, im in rec.images.items()}
    thr = cfg.filter_thresholds[min(it, len(cfg.filter_thresholds) - 1)]
    with profiler.record_function("refine/geometry_refinement"):
        m.retriangulate(rec)  # structure follows the refined 2D points
        n_merged = m.merge_tracks(rec, thr)
        n_completed = (
            m.complete_tracks(rec, thr) if hasattr(m, "kpt_track") else 0
        )
        if cfg.fix_all_poses:  # triangulation mode: structure-only BA
            m.global_ba(rec, fixed_ids=set(rec.registered_images),
                        gauge="full")
        else:
            m.global_ba(rec, fixed_ids=_farthest_pair(rec))
        n_rm = m.filter_points(rec, thr, cfg.min_tri_angle_deg)
    if verbose:
        print(f"  BA done at {thr}px: merged {n_merged}, "
              f"completed {n_completed}, filtered {n_rm}")

    # Re-registration of dropped images (even iterations), relaxed thresholds
    if (it % cfg.reregister_every) == 0 and mapper is not None \
            and not cfg.fix_all_poses:
        for img_id in list(rec.images):
            if not rec.images[img_id].registered:
                ok = mapper._try_register(
                    rec, img_id,
                    abs_pose_max_error=cfg.rereg_abs_pose_max_error,
                    min_num_inliers=cfg.rereg_min_num_inliers,
                    min_inlier_ratio=cfg.rereg_min_inlier_ratio,
                )
                if ok and verbose:
                    print(f"  re-registered image {img_id}")
    return rec
