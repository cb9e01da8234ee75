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

All neural work is static-shape bag batches; the loop itself is host logic.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import camera_center
from ..models.multiview_matcher import MultiviewRefiner, RefinerConfig
from ..sfm.mapper import IncrementalMapper, MapperConfig
from ..sfm.reconstruction import Reconstruction
from .bags import pack_track_bags


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    n_iters: int = 2
    windows: tuple = (15, 11, 7)       # per-iteration attention window
    crop_extra: int = 4                # backbone context beyond the window
    filter_thresholds: tuple = (3.0, 2.0, 1.5)  # px, per iteration
    min_tri_angle_deg: float = 1.5
    max_track_length: int = 16
    chunk_tracks: int = 512
    reregister_every: int = 2
    compute_dtype: str = "float32"
    save_iters_to: str | None = None  # write model_refined_{i}/ per iteration
                                      # (reference post_optimization artifact)


def _farthest_pair(rec: Reconstruction) -> set:
    reg = rec.registered_images
    centers = {
        i: np.asarray(camera_center(
            jnp.asarray(rec.images[i].qvec), jnp.asarray(rec.images[i].tvec)))
        for i in reg
    }
    best, pair = -1.0, set(reg[:2])
    for a in range(len(reg)):
        for b in range(a + 1, len(reg)):
            d = float(np.linalg.norm(centers[reg[a]] - centers[reg[b]]))
            if d > best:
                best, pair = d, {reg[a], reg[b]}
    return pair


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

    profiler = PassThroughProfiler()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    Hmax = max(im.shape[0] for im in images_by_id.values())
    Wmax = max(im.shape[1] for im in images_by_id.values())

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
                rec, images_by_id, params, cfg, mapper, rng, verbose,
                it, Hmax, Wmax, profiler,
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
    rec, images_by_id, params, cfg, mapper, rng, verbose, it, Hmax, Wmax,
    profiler,
):
    window = cfg.windows[min(it, len(cfg.windows) - 1)]
    rcfg = RefinerConfig(
        crop_size=window + cfg.crop_extra, window=window,
        compute_dtype=cfg.compute_dtype,
    )
    model = MultiviewRefiner(rcfg)
    model_params = params
    apply = jax.jit(model.apply)

    with profiler.record_function("refine/pack_bags"):
        bags = pack_track_bags(
            rec, max_track_length=cfg.max_track_length,
            chunk_tracks=cfg.chunk_tracks,
        )
    if verbose:
        print(f"refine iter {it}: {len(bags)} bags, window {window}")
    with profiler.record_function("refine/multiview_match"):
        for bag in bags:
            T = len(bag.point_ids)
            t_pad = cfg.chunk_tracks
            imgs = np.zeros((len(bag.image_ids), Hmax, Wmax, 1), np.float32)
            for bi, img_id in enumerate(bag.image_ids):
                a = images_by_id[img_id]
                imgs[bi, : a.shape[0], : a.shape[1], 0] = a
            if model_params is None:
                model_params = model.init(
                    rng, jnp.asarray(imgs[:1]),
                    jnp.zeros((1, cfg.max_track_length), jnp.int32),
                    jnp.zeros((1, cfg.max_track_length, 2), jnp.float32),
                    jnp.ones((1, cfg.max_track_length), jnp.float32),
                    jnp.zeros((1, cfg.max_track_length), bool),
                )
            out = apply(
                model_params,
                jnp.asarray(imgs),
                jnp.asarray(_pad_tracks(bag.node_img, t_pad)),
                jnp.asarray(_pad_tracks(bag.node_xy, t_pad)),
                jnp.asarray(_pad_tracks(bag.node_scale, t_pad, 1.0)),
                jnp.asarray(_pad_tracks(bag.node_mask, t_pad)),
            )
            coords = np.asarray(out.coords)[:T]
            # Write refined query observations back into image keypoints
            for r, pid in enumerate(bag.point_ids):
                if pid not in rec.points:
                    continue
                for vpos in range(1, coords.shape[1]):
                    if not bag.node_mask[r, vpos]:
                        continue
                    img_id = bag.image_ids[bag.node_img[r, vpos]]
                    kpt = int(bag.node_kpt[r, vpos])
                    rec.images[img_id].xys[kpt] = coords[r, vpos]

    # Geometry refinement: BA (farthest-pair gauge) + filter
    m = mapper or IncrementalMapper(MapperConfig())
    if not hasattr(m, "names"):
        # allow running on a standalone reconstruction
        m.names = [im.name for im in rec.images.values()]
        m.name_to_id = {im.name: i for i, im in rec.images.items()}
    thr = cfg.filter_thresholds[min(it, len(cfg.filter_thresholds) - 1)]
    with profiler.record_function("refine/geometry_refinement"):
        m.retriangulate(rec)  # structure follows the refined 2D points
        m.global_ba(rec, fixed_ids=_farthest_pair(rec))
        n_rm = m.filter_points(rec, thr, cfg.min_tri_angle_deg)
    if verbose:
        print(f"  BA done, filtered {n_rm} at {thr}px")

    # Re-registration of dropped images (even iterations)
    if (it % cfg.reregister_every) == 0 and mapper is not None:
        for img_id in list(rec.images):
            if not rec.images[img_id].registered:
                if mapper._try_register(rec, img_id) and verbose:
                    print(f"  re-registered image {img_id}")
    return rec
