"""Incremental mapper: host-orchestrated loop over jitted geometry kernels.

Replaces the COLMAP fork's `mapper` verb that the reference drives through
hloc (src/sfm_runner/coarse_sfm_runner.py:71; thresholds from
hydra_configs/*/dfsfm.yaml colmap_mapper_cfgs). The irregular control flow
(init-pair choice, next-view selection, registration retries) stays on host;
every numeric kernel — pair verification RANSAC, PnP, multi-view DLT
triangulation, Schur-LM BA — is a fixed-shape jitted JAX program bucketed to
power-of-two sizes so a handful of compilations serve a whole dataset.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.triangulation import projection_matrices, triangulate_dlt
from ..data import colmap_io
from .ba import bundle_adjust
from .pnp import estimate_absolute_pose
from .reconstruction import Reconstruction, RImage
from .tracks import Track, build_tracks
from .twoview import estimate_relative_pose, normalize_points


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    # Geometric verification / mapper thresholds (px), reference defaults for
    # 8px-grid detector-free keypoints: hydra_configs/eth3d_sfm/dfsfm.yaml:99-111
    geometry_verify_thr: float = 10.0
    init_max_error: float = 10.0
    abs_pose_max_error: float = 12.0
    abs_pose_min_num_inliers: int = 30
    abs_pose_min_inlier_ratio: float = 0.25
    filter_max_reproj_error: float = 10.0
    min_tri_angle_deg: float = 1.5
    init_min_tri_angle_deg: float = 4.0
    min_model_size: int = 3
    tri_ignore_two_view_tracks: bool = False
    default_focal_factor: float = 1.2  # COLMAP prior when intrinsics unknown
    refine_focal: bool = False         # refine focal in BA (unknown-intrinsics mode)
    # Unknown-intrinsics focal search: re-run two-view RANSAC at several
    # focal factors and vote a per-image focal from the winning factors
    # (phototourism focals vary several-fold around any single prior; COLMAP
    # leans on EXIF + per-registration focal refinement for the same reason)
    focal_search_factors: tuple = (0.6, 1.0, 1.6)
    ba_global_images_ratio: float = 1.3  # global BA when model grew by this
    max_init_trials: int = 5
    ransac_hypotheses: int = 512
    seed: int = 0


def _pad_pow2(n: int, lo: int = 64) -> int:
    m = lo
    while m < n:
        m *= 2
    return m


def _camera_cache(rec: Reconstruction) -> Dict[int, tuple]:
    """{img_id: (R, t, C, K)} numpy for all registered images, built with ONE
    batched quat->rotmat call (per-observation jnp dispatches made the old
    per-track loops minutes-slow at real scene scale)."""
    from ..core.geometry import quat_to_rotmat

    reg = rec.registered_images
    if not reg:
        return {}
    q = np.stack([rec.images[i].qvec for i in reg])
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)), np.float64)
    out = {}
    for k, i in enumerate(reg):
        t = rec.images[i].tvec
        out[i] = (R[k], t, -R[k].T @ t, rec.K_of_image(i))
    return out


class IncrementalMapper:
    """One scene. Usage: mapper = IncrementalMapper(cfg); rec = mapper.run(...)."""

    def __init__(self, cfg: MapperConfig = MapperConfig()):
        self.cfg = cfg
        self._rng = jax.random.PRNGKey(cfg.seed)

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # -- setup -----------------------------------------------------------------

    def _setup(
        self,
        keypoints: Dict[str, np.ndarray],
        image_sizes: Dict[str, Tuple[int, int]],
        intrinsics: Optional[Dict[str, np.ndarray]],
    ) -> Reconstruction:
        rec = Reconstruction()
        self.names = sorted(keypoints)
        self.name_to_id = {n: i + 1 for i, n in enumerate(self.names)}
        for n in self.names:
            i = self.name_to_id[n]
            w, h = image_sizes[n]
            if intrinsics is not None and n in intrinsics:
                K = np.asarray(intrinsics[n], np.float64)
                params = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
                model = "PINHOLE"
            else:
                f = self.cfg.default_focal_factor * max(w, h)
                params = np.array([f, f, w / 2.0, h / 2.0])
                model = "PINHOLE"
            rec.add_camera(colmap_io.Camera(i, model, w, h, params))
            rec.add_image(
                RImage(id=i, name=n, camera_id=i,
                       xys=np.asarray(keypoints[n], np.float64))
            )
        return rec

    # -- two-view verification ---------------------------------------------------

    def verify_pairs(
        self,
        rec: Reconstruction,
        match_indices: Dict[Tuple[str, str], np.ndarray],
        focal_search: bool = False,
    ) -> Dict[Tuple[int, int], dict]:
        """RANSAC-verify every pair; returns {(id0, id1): {matches, qvec,
        tvec, n_inliers}} with only inlier matches kept (the role of hloc's
        geometric verification import).

        With focal_search, each pair is verified at several focal factors and
        the best factor's result is kept; afterwards every camera's focal is
        rescaled to the median winning factor of its pairs (then refined
        further by BA when cfg.refine_focal).
        """
        cfg = self.cfg
        factors = cfg.focal_search_factors if focal_search else (1.0,)
        out: Dict[Tuple[int, int], dict] = {}
        votes: Dict[int, list] = {}
        for (na, nb) in sorted(match_indices):
            m = np.asarray(match_indices[(na, nb)])
            if len(m) < 8:
                continue
            ia, ib = self.name_to_id[na], self.name_to_id[nb]
            Ka, Kb = rec.K_of_image(ia), rec.K_of_image(ib)
            uv0 = rec.images[ia].xys[m[:, 0]]
            uv1 = rec.images[ib].xys[m[:, 1]]
            n_pad = _pad_pow2(len(m))
            best = None
            for fac in factors:
                Kaf = Ka.copy(); Kaf[0, 0] *= fac; Kaf[1, 1] *= fac
                Kbf = Kb.copy(); Kbf[0, 0] *= fac; Kbf[1, 1] *= fac
                x0 = np.zeros((n_pad, 2), np.float32)
                x1 = np.zeros((n_pad, 2), np.float32)
                x0[: len(m)] = np.asarray(
                    normalize_points(jnp.asarray(uv0), jnp.asarray(Kaf))
                )
                x1[: len(m)] = np.asarray(
                    normalize_points(jnp.asarray(uv1), jnp.asarray(Kbf))
                )
                mask = np.zeros(n_pad, bool)
                mask[: len(m)] = True
                f_mean = float(np.mean([Kaf[0, 0], Kaf[1, 1],
                                        Kbf[0, 0], Kbf[1, 1]]))
                res = estimate_relative_pose(
                    jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(mask),
                    self._next_rng(),
                    threshold=cfg.geometry_verify_thr / f_mean,
                    n_hypotheses=cfg.ransac_hypotheses,
                )
                n_inl = int(res.n_inliers)
                if best is None or n_inl > best[0]:
                    best = (n_inl, fac, res)
            n_inl, fac, res = best
            inl = np.asarray(res.inliers)[: len(m)]
            if inl.sum() < 8:
                continue
            votes.setdefault(ia, []).append(fac)
            votes.setdefault(ib, []).append(fac)
            out[(ia, ib)] = {
                "matches": m[inl],
                "qvec": np.asarray(res.qvec, np.float64),
                "tvec": np.asarray(res.tvec, np.float64),
                "n_inliers": int(inl.sum()),
            }
        if focal_search:
            for img_id, fs in votes.items():
                fac = float(np.median(fs))
                cam = rec.cameras[rec.images[img_id].camera_id]
                cam.params = cam.params.copy()
                cam.params[0] *= fac
                cam.params[1] *= fac
        return out

    # -- triangulation helpers -----------------------------------------------------

    def _triangulate_tracks(
        self, rec: Reconstruction, tracks: Sequence[Track],
        track_ids: Sequence[int], min_angle_deg: float, max_error: float,
    ) -> Dict[int, Tuple[np.ndarray, List[Tuple[int, int]]]]:
        """Triangulate each candidate track from its currently-registered
        observations; returns {track_id: (xyz, obs_used)} for accepted ones.
        All geometry checks run as vectorized numpy over padded (n, V)
        arrays using a batched camera cache."""
        cache = _camera_cache(rec)
        cand = []
        for tid in track_ids:
            obs = [(i, k) for (i, k) in tracks[tid].observations if i in cache]
            if len(obs) >= 2:
                cand.append((tid, obs))
        if not cand:
            return {}
        V = max(len(o) for _, o in cand)
        n = len(cand)
        n_pad = _pad_pow2(n, lo=32)
        P = np.zeros((n_pad, V, 3, 4), np.float32)
        UV = np.zeros((n_pad, V, 2), np.float32)
        M = np.zeros((n_pad, V), bool)
        R_arr = np.zeros((n, V, 3, 3))
        t_arr = np.zeros((n, V, 3))
        C_arr = np.zeros((n, V, 3))
        K_arr = np.zeros((n, V, 3, 3))
        for r, (tid, obs) in enumerate(cand):
            for v, (img_id, kpt) in enumerate(obs):
                R, t, C, K = cache[img_id]
                P[r, v, :, :3] = K @ R
                P[r, v, :, 3] = K @ t
                UV[r, v] = rec.images[img_id].xys[kpt]
                M[r, v] = True
                R_arr[r, v], t_arr[r, v], C_arr[r, v], K_arr[r, v] = R, t, C, K
        X, ok = triangulate_dlt(jnp.asarray(P), jnp.asarray(UV), jnp.asarray(M))
        X = np.asarray(X[:n], np.float64)
        ok = np.asarray(ok[:n]) & np.all(np.isfinite(X), axis=1)

        # Vectorized cheirality + reprojection checks over (n, V)
        live = M[:n]
        Xc = np.einsum("nvij,nj->nvi", R_arr, X) + t_arr
        z = Xc[..., 2]
        front = z > 1e-6
        z_safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
        uvp = np.einsum("nvij,nvj->nvi", K_arr, Xc / z_safe[..., None])[..., :2]
        err = np.linalg.norm(uvp - UV[:n], axis=-1)
        good = live & front & (err <= max_error) & ok[:, None]

        # Max pairwise triangulation angle over surviving observations
        rays = C_arr - X[:, None, :]
        rays /= np.maximum(np.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
        cosang = np.einsum("nvi,nwi->nvw", rays, rays)
        pair_ok = good[:, :, None] & good[:, None, :]
        np.clip(cosang, -1.0, 1.0, out=cosang)
        ang = np.degrees(np.arccos(cosang))
        ang = np.where(pair_ok, ang, 0.0)
        max_ang = ang.max(axis=(1, 2))

        accepted: Dict[int, Tuple[np.ndarray, list]] = {}
        for r, (tid, obs) in enumerate(cand):
            g = good[r]
            if g.sum() < 2 or max_ang[r] < min_angle_deg:
                continue
            good_obs = [obs[v] for v in range(len(obs)) if g[v]]
            accepted[tid] = (X[r], good_obs)
        return accepted

    # -- registration ----------------------------------------------------------------

    def _try_register(self, rec: Reconstruction, img_id: int) -> bool:
        cfg = self.cfg
        im = rec.images[img_id]
        X_list, x_list = [], []
        for kpt, tid in self.kpt_track.get(img_id, {}).items():
            pid = self.track_pid[tid]
            if pid >= 0 and pid in rec.points:
                X_list.append(rec.points[pid]["xyz"])
                x_list.append(im.xys[kpt])
        n = len(X_list)
        if n < max(6, cfg.abs_pose_min_num_inliers):
            return False
        K = rec.K_of_image(img_id)
        f_mean = float((K[0, 0] + K[1, 1]) / 2)
        n_pad = _pad_pow2(n)
        Xp = np.zeros((n_pad, 3), np.float32)
        xp = np.zeros((n_pad, 2), np.float32)
        Xp[:n] = np.asarray(X_list)
        xp[:n] = np.asarray(
            normalize_points(jnp.asarray(np.asarray(x_list)), jnp.asarray(K))
        )
        mask = np.zeros(n_pad, bool)
        mask[:n] = True
        res = estimate_absolute_pose(
            jnp.asarray(Xp), jnp.asarray(xp), jnp.asarray(mask),
            self._next_rng(), threshold=cfg.abs_pose_max_error / f_mean,
            n_hypotheses=max(64, cfg.ransac_hypotheses // 2),
        )
        n_inl = int(res.n_inliers)
        if n_inl < cfg.abs_pose_min_num_inliers or n_inl < cfg.abs_pose_min_inlier_ratio * n:
            return False
        rec.set_pose(img_id, np.asarray(res.qvec, np.float64),
                     np.asarray(res.tvec, np.float64))
        return True

    # -- BA + filtering ------------------------------------------------------------

    def global_ba(self, rec: Reconstruction, fixed_ids: Optional[set] = None):
        reg = sorted(rec.registered_images)
        if len(reg) < 2 or not rec.points:
            return
        id_to_idx = {im: i for i, im in enumerate(reg)}
        pids = sorted(rec.points)
        pid_to_idx = {p: i for i, p in enumerate(pids)}
        obs_uv, obs_cam, obs_pt = [], [], []
        for p in pids:
            for (img_id, kpt) in rec.points[p]["track"]:
                if img_id not in id_to_idx:
                    continue
                obs_uv.append(rec.images[img_id].xys[kpt])
                obs_cam.append(id_to_idx[img_id])
                obs_pt.append(pid_to_idx[p])
        if not obs_uv:
            return
        q, t = rec.pose_arrays(reg)
        intr = np.stack([
            np.array([rec.K_of_image(i)[0, 0], rec.K_of_image(i)[1, 1],
                      rec.K_of_image(i)[0, 2], rec.K_of_image(i)[1, 2]])
            for i in reg
        ])
        pts = np.stack([rec.points[p]["xyz"] for p in pids])
        if fixed_ids is None:
            # Gauge: fix the first two registered images
            fixed_ids = set(reg[:2])
        fixed = np.array([i in fixed_ids for i in reg])
        q2, t2, intr2, pts2, _cost = bundle_adjust(
            q, t, intr, pts,
            np.asarray(obs_uv, np.float64),
            np.asarray(obs_cam, np.int32),
            np.asarray(obs_pt, np.int32),
            fixed_cams=fixed,
            refine_focal=self.cfg.refine_focal,
            huber_delta=4.0,
        )
        for i, img_id in enumerate(reg):
            rec.set_pose(img_id, q2[i], t2[i])
            if self.cfg.refine_focal:
                cam = rec.cameras[rec.images[img_id].camera_id]
                cam.params = np.array([intr2[i, 0], intr2[i, 1],
                                       intr2[i, 2], intr2[i, 3]])
        for j, p in enumerate(pids):
            rec.points[p]["xyz"] = pts2[j]

    def retriangulate(self, rec: Reconstruction) -> int:
        """Re-solve every point's DLT from its current observations (the
        refiner moves 2D keypoints, so structure must follow before BA —
        COLMAP's incremental_model_refiner retriangulates internally).
        Returns the number of updated points."""
        pids = sorted(rec.points)
        if not pids:
            return 0
        V = max(len(rec.points[p]["track"]) for p in pids)
        n = len(pids)
        n_pad = _pad_pow2(n, lo=32)
        Pm = np.zeros((n_pad, V, 3, 4), np.float32)
        UV = np.zeros((n_pad, V, 2), np.float32)
        M = np.zeros((n_pad, V), bool)
        for r, pid in enumerate(pids):
            for v, (img_id, kpt) in enumerate(rec.points[pid]["track"][:V]):
                im = rec.images[img_id]
                Pm[r, v] = np.asarray(projection_matrices(
                    jnp.asarray(im.qvec), jnp.asarray(im.tvec),
                    jnp.asarray(rec.K_of_image(img_id)),
                ))
                UV[r, v] = im.xys[kpt]
                M[r, v] = True
        X, ok = triangulate_dlt(jnp.asarray(Pm), jnp.asarray(UV), jnp.asarray(M))
        X = np.asarray(X, np.float64)
        ok = np.asarray(ok)
        n_upd = 0
        for r, pid in enumerate(pids):
            if ok[r] and np.all(np.isfinite(X[r])):
                rec.points[pid]["xyz"] = X[r]
                n_upd += 1
        return n_upd

    def filter_points(self, rec: Reconstruction, max_error: float,
                      min_angle_deg: float) -> int:
        """Drop observations with reproj error > max_error; drop points whose
        max triangulation angle < min_angle or track < 2. Returns #removed.
        Vectorized over a padded (P, T) observation table."""
        pids = sorted(rec.points)
        if not pids:
            return 0
        cache = _camera_cache(rec)
        T = max(len(rec.points[p]["track"]) for p in pids)
        n = len(pids)
        X = np.stack([rec.points[p]["xyz"] for p in pids])
        R_arr = np.zeros((n, T, 3, 3))
        t_arr = np.zeros((n, T, 3))
        C_arr = np.zeros((n, T, 3))
        K_arr = np.zeros((n, T, 3, 3))
        UV = np.zeros((n, T, 2))
        live = np.zeros((n, T), bool)
        for r, pid in enumerate(pids):
            for v, (img_id, kpt) in enumerate(rec.points[pid]["track"]):
                if img_id not in cache:
                    continue
                R, t, C, K = cache[img_id]
                R_arr[r, v], t_arr[r, v], C_arr[r, v], K_arr[r, v] = R, t, C, K
                UV[r, v] = rec.images[img_id].xys[kpt]
                live[r, v] = True
        Xc = np.einsum("nvij,nj->nvi", R_arr, X) + t_arr
        z = Xc[..., 2]
        front = z > 1e-6
        z_safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
        uvp = np.einsum("nvij,nvj->nvi", K_arr, Xc / z_safe[..., None])[..., :2]
        err = np.linalg.norm(uvp - UV, axis=-1)
        good = live & front & (err <= max_error)
        rays = C_arr - X[:, None, :]
        rays /= np.maximum(np.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
        cosang = np.clip(np.einsum("nvi,nwi->nvw", rays, rays), -1.0, 1.0)
        ang = np.degrees(np.arccos(cosang))
        ang = np.where(good[:, :, None] & good[:, None, :], ang, 0.0)
        max_ang = ang.max(axis=(1, 2))

        removed = 0
        for r, pid in enumerate(pids):
            track = list(rec.points[pid]["track"])
            bad = [track[v] for v in range(len(track)) if live[r, v] and not good[r, v]]
            # also drop observations of unregistered images (live False rows)
            bad += [track[v] for v in range(len(track)) if not live[r, v]]
            for (img_id, kpt) in bad:
                rec.remove_observation(pid, img_id, kpt)
                removed += 1
            if pid in rec.points and max_ang[r] < min_angle_deg:
                rec.remove_point(pid)
                removed += 1
        return removed

    # -- main loop -----------------------------------------------------------------

    def run(
        self,
        keypoints: Dict[str, np.ndarray],
        match_indices: Dict[Tuple[str, str], np.ndarray],
        image_sizes: Dict[str, Tuple[int, int]],
        intrinsics: Optional[Dict[str, np.ndarray]] = None,
        verbose: bool = False,
    ) -> Optional[Reconstruction]:
        cfg = self.cfg
        rec = self._setup(keypoints, image_sizes, intrinsics)
        verified = self.verify_pairs(
            rec, match_indices, focal_search=intrinsics is None
        )
        if not verified:
            return None

        # Track graph over verified matches
        n_kpts = {self.name_to_id[n]: len(keypoints[n]) for n in self.names}
        vm = {pair: v["matches"] for pair, v in verified.items()}
        tracks = build_tracks(n_kpts, vm)
        if cfg.tri_ignore_two_view_tracks:
            tracks = [t for t in tracks if len(t) > 2]
        self.tracks = tracks
        self.track_pid = np.full(len(tracks), -1, np.int64)
        self.kpt_track: Dict[int, Dict[int, int]] = {}
        for tid, t in enumerate(tracks):
            for (img_id, kpt) in t.observations:
                self.kpt_track.setdefault(img_id, {})[kpt] = tid

        # --- initialization: best verified pair by inliers, angle-checked ---
        ranked = sorted(verified.items(), key=lambda kv: -kv[1]["n_inliers"])
        init_done = False
        for (ia, ib), v in ranked[: cfg.max_init_trials]:
            rec.set_pose(ia, np.array([1.0, 0, 0, 0]), np.zeros(3))
            rec.set_pose(ib, v["qvec"], v["tvec"])
            tids_a = set(self.kpt_track.get(ia, {}).values())
            tids_b = set(self.kpt_track.get(ib, {}).values())
            tids = sorted(tids_a & tids_b)
            tri = self._triangulate_tracks(
                rec, tracks, tids, cfg.init_min_tri_angle_deg, cfg.init_max_error
            )
            if len(tri) >= 30 or (len(tri) >= 8 and len(ranked) == 1):
                for tid, (xyz, obs) in tri.items():
                    pid = rec.add_point(xyz, obs)
                    if pid >= 0:
                        self.track_pid[tid] = pid
                init_done = True
                init_pair = (ia, ib)
                if verbose:
                    print(f"init pair ({ia},{ib}): {len(tri)} points")
                break
            rec.images[ia].qvec = None
            rec.images[ia].tvec = None
            rec.images[ib].qvec = None
            rec.images[ib].tvec = None
        if not init_done:
            return None

        self.global_ba(rec, fixed_ids=set(init_pair))
        self.filter_points(rec, cfg.filter_max_reproj_error, cfg.min_tri_angle_deg)

        # --- incremental registration ---
        last_ba_size = 2
        while True:
            unreg = [i for i in rec.images if not rec.images[i].registered]
            if not unreg:
                break
            # Rank by visible 3D correspondences
            scored = []
            for i in unreg:
                cnt = sum(
                    1 for tid in self.kpt_track.get(i, {}).values()
                    if self.track_pid[tid] >= 0 and int(self.track_pid[tid]) in rec.points
                )
                scored.append((cnt, i))
            scored.sort(key=lambda x: (-x[0], x[1]))
            progress = False
            for cnt, img_id in scored:
                if cnt < cfg.abs_pose_min_num_inliers:
                    break
                if self._try_register(rec, img_id):
                    progress = True
                    if verbose:
                        print(f"registered image {img_id} ({cnt} corrs)")
                    # Triangulate ALL pending tracks with >=2 registered
                    # views (COLMAP keeps retriangulating each round — only
                    # doing the new image's tracks starves later
                    # registrations of 2D-3D correspondences)
                    self._triangulate_pending(rec)
                    # Complete existing points with this image's observations
                    self._complete_image(rec, img_id)
                    n_reg = len(rec.registered_images)
                    if n_reg >= last_ba_size * cfg.ba_global_images_ratio:
                        self.global_ba(rec, fixed_ids=set(init_pair))
                        self.filter_points(
                            rec, cfg.filter_max_reproj_error, cfg.min_tri_angle_deg
                        )
                        self._triangulate_pending(rec)
                        last_ba_size = n_reg
                    break
            if not progress:
                break

        # Fixpoint: a global BA + filter cleans the model enough that
        # previously-failed registrations (inlier-ratio rejections against a
        # dirty point set) can succeed — keep alternating until no progress.
        for _ in range(len(rec.images)):
            self.global_ba(rec, fixed_ids=set(init_pair))
            self.filter_points(
                rec, cfg.filter_max_reproj_error, cfg.min_tri_angle_deg
            )
            self._triangulate_pending(rec)
            registered_any = False
            for img_id in sorted(rec.images):
                if rec.images[img_id].registered:
                    continue
                cnt = sum(
                    1 for tid in self.kpt_track.get(img_id, {}).values()
                    if self.track_pid[tid] >= 0
                    and int(self.track_pid[tid]) in rec.points
                )
                if cnt < cfg.abs_pose_min_num_inliers:
                    continue
                if self._try_register(rec, img_id):
                    registered_any = True
                    if verbose:
                        print(f"late-registered image {img_id} ({cnt} corrs)")
                    self._triangulate_pending(rec)
                    self._complete_image(rec, img_id)
            if not registered_any:
                break
        if len(rec.registered_images) < cfg.min_model_size:
            return None
        return rec

    def _triangulate_pending(self, rec: Reconstruction):
        """Triangulate every track without a 3D point that now has >= 2
        registered observations."""
        cfg = self.cfg
        pending = sorted(
            tid for tid in range(len(self.tracks))
            if self.track_pid[tid] < 0
        )
        if not pending:
            return
        tri = self._triangulate_tracks(
            rec, self.tracks, pending,
            cfg.min_tri_angle_deg, cfg.filter_max_reproj_error,
        )
        for tid, (xyz, obs) in tri.items():
            pid = rec.add_point(xyz, obs)
            if pid >= 0:
                self.track_pid[tid] = pid

    def _complete_image(self, rec: Reconstruction, img_id: int):
        """Add this image's observations to already-triangulated tracks when
        they reproject within threshold (COLMAP tri-complete semantics)."""
        cfg = self.cfg
        im = rec.images[img_id]
        cache = _camera_cache(rec)
        if img_id not in cache:
            return
        R, t, _C, K = cache[img_id]
        cand = []
        for kpt, tid in self.kpt_track.get(img_id, {}).items():
            pid = int(self.track_pid[tid])
            if pid < 0 or pid not in rec.points or im.point3D_ids[kpt] >= 0:
                continue
            cand.append((kpt, pid))
        if not cand:
            return
        X = np.stack([rec.points[pid]["xyz"] for _, pid in cand])
        uv_obs = np.stack([im.xys[kpt] for kpt, _ in cand])
        Xc = X @ R.T + t
        z = Xc[:, 2]
        z_safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
        uvp = (Xc / z_safe[:, None]) @ K.T
        err = np.linalg.norm(uvp[:, :2] - uv_obs, axis=-1)
        ok = (z > 1e-6) & (err <= cfg.filter_max_reproj_error)
        for (kpt, pid), good in zip(cand, ok):
            if good:
                im.point3D_ids[kpt] = pid
                rec.points[pid]["track"].append((img_id, kpt))
