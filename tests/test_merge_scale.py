"""Merge/complete parity validation at scale (VERDICT r2 #9).

Property: splitting GT tracks into fragments must be EXACTLY undone by
merge_tracks, while decoy near-duplicates — 3D-close point pairs whose
union reprojects above threshold in at least one (close-up) view — must
survive. The vectorized merge must do this at 100k-point scale in seconds.
"""

import time

import numpy as np
import pytest

from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig
from detectorfreesfm_tpu.sfm.reconstruction import Reconstruction, RImage
from detectorfreesfm_tpu.data import colmap_io


def _look_at_R(eye, target):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    return np.stack([right, up, fwd])


def _build_split_scene(n_gt=1000, thr=4.0, seed=0, decoy_mode="close_cam"):
    """Returns (rec, split_pairs, decoy_pairs).

    Cameras: 6 far (depth ~10) + 1 close-up (depth ~2.5). GT points at
    z~10. Even GT points are SPLIT into two fragments (tiny 3D offset,
    disjoint far-camera halves + one shared far camera) -> must merge.
    Odd GT points come as DECOY pairs: in-plane offset sized so far views
    agree within thr but the close-up view disagrees (> thr) -> must stay.
    """
    rng = np.random.default_rng(seed)
    f = 600.0
    K = np.array([[f, 0, 512.0], [0, f, 512.0], [0, 0, 1.0]])
    eyes = [np.array([3.5 * np.sin(a), 0.8 * np.cos(2 * a),
                      10.0 - 9.0 - 1.0 + 0.0]) for a in
            np.linspace(-0.5, 0.5, 6)]
    eyes = [np.array([3.5 * np.sin(a), 0.8 * np.cos(2 * a), 0.0])
            for a in np.linspace(-0.5, 0.5, 6)]
    eyes.append(np.array([0.3, 0.2, 7.5]))   # close-up: depth ~2.5
    target = np.array([0.0, 0.0, 10.0])
    cams = []
    for eye in eyes:
        R = _look_at_R(eye, target)
        t = -R @ eye
        cams.append((R, t))
    n_cams = len(cams)

    # depth/f scale at far cams ~ 10/600; merge radius = thr * median scale
    far_scale = 10.0 / f
    rec = Reconstruction()
    kpts = [[] for _ in range(n_cams)]      # per-camera uv list
    obs_of_point = []                        # point row -> [(cam, kpt_idx)]
    pts_rows = []

    def project(ci, X):
        R, t = cams[ci]
        Xc = R @ X + t
        return np.array([f * Xc[0] / Xc[2] + 512.0,
                         f * Xc[1] / Xc[2] + 512.0]), Xc[2]

    def add_obs(ci, X):
        uv, z = project(ci, X)
        kpts[ci].append(uv)
        return ci, len(kpts[ci]) - 1

    split_pairs, decoy_pairs = [], []
    # GT points on a jittered grid with spacing >> merge radius (~0.067 at
    # thr=4), so the ONLY within-radius pairs are the constructed ones —
    # random near-coincidences would legitimately merge under the COLMAP
    # criterion and break exact accounting.
    # Flat-ish grid: few z layers keep all depths positive and bounded
    # while xy spreads; spacing 0.6 >> max radius (~0.09) + max decoy
    # offset (~0.16), so constructed pairs never collide with neighbors.
    spacing = 0.6
    nz = 8
    nxy = int(np.ceil(np.sqrt(n_gt / nz)))
    ii = np.arange(n_gt)
    grid = np.stack([ii % nxy, (ii // nxy) % nxy, ii // (nxy * nxy)],
                    axis=1).astype(np.float64)
    gt = (grid - grid.mean(0)) * spacing + np.array([0, 0, 10.0])
    gt += rng.uniform(-0.05, 0.05, gt.shape)
    for g in range(n_gt):
        X = gt[g]
        if g % 2 == 0:
            # split track: two fragments offset by 0.05 * radius
            delta = rng.normal(0, 1, 3)
            delta = delta / np.linalg.norm(delta) * 0.05 * thr * far_scale
            Xa, Xb = X, X + delta
            obs_a = [add_obs(ci, Xa) for ci in (0, 1, 2)]
            obs_b = [add_obs(ci, Xb) for ci in (2, 3, 4)]  # cam 2 shared
            pts_rows.append((Xa, obs_a))
            pts_rows.append((Xb, obs_b))
            split_pairs.append((len(pts_rows) - 2, len(pts_rows) - 1))
        else:
            direction = np.array([1.0, 0.0, 0.0])
            if decoy_mode == "close_cam":
                # decoy: in-plane offset sized from the ACTUAL close-cam
                # depth so the close view disagrees (2*thr px) while far
                # views agree (< thr at ~4x the depth)
                R6, t6 = cams[6]
                depth6 = float((R6 @ X + t6)[2])
                d3 = 2.0 * thr * max(depth6, 1.0) / f
            else:
                # decoy: beyond the per-point merge radius (distance gate);
                # radius = thr * median(depth/f) ~ thr * X_z / f here
                d3 = 1.8 * thr * float(X[2]) / f
            Xa, Xb = X, X + direction * d3
            obs_a = [add_obs(ci, Xa) for ci in (0, 1, 6)]
            obs_b = [add_obs(ci, Xb) for ci in (3, 4, 6)]  # cam 6 = close
            pts_rows.append((Xa, obs_a))
            pts_rows.append((Xb, obs_b))
            decoy_pairs.append((len(pts_rows) - 2, len(pts_rows) - 1))

    for ci, (R, t) in enumerate(cams):
        from detectorfreesfm_tpu.core.geometry import np_rotmat_to_quat

        rec.add_camera(colmap_io.Camera(ci + 1, "PINHOLE", 1024, 1024,
                                        np.array([f, f, 512.0, 512.0])))
        q = np_rotmat_to_quat(R[None])[0]
        rec.add_image(RImage(
            id=ci + 1, name=f"cam{ci}", camera_id=ci + 1,
            xys=np.asarray(kpts[ci], np.float64).reshape(-1, 2),
            qvec=q, tvec=t.astype(np.float64),
        ))
    row_pid = []
    for X, obs in pts_rows:
        pid = rec.add_point(X, [(ci + 1, ki) for ci, ki in obs])
        assert pid > 0
        row_pid.append(pid)
    return rec, [(row_pid[a], row_pid[b]) for a, b in split_pairs], \
        [(row_pid[a], row_pid[b]) for a, b in decoy_pairs]


def test_merge_reunites_split_tracks_exactly():
    thr = 4.0
    rec, split_pairs, decoy_pairs = _build_split_scene(n_gt=800, thr=thr)
    mapper = IncrementalMapper(MapperConfig())
    n = mapper.merge_tracks(rec, thr)
    assert n == len(split_pairs), (n, len(split_pairs))
    for pa, pb in split_pairs:
        alive = (pa in rec.points) + (pb in rec.points)
        assert alive == 1, (pa, pb)
        survivor = pa if pa in rec.points else pb
        # 3 + 3 obs minus the duplicate in the shared camera (COLMAP keeps
        # one observation per image per point)
        assert len(rec.points[survivor]["track"]) == 5
    for pa, pb in decoy_pairs:
        assert pa in rec.points and pb in rec.points


@pytest.mark.slow
def test_merge_100k_points_in_seconds():
    thr = 4.0
    # 25k GT -> 50k points (25k split-pairs at even indexes -> 12.5k merges)
    rec, split_pairs, decoy_pairs = _build_split_scene(
        n_gt=50_000, thr=thr, decoy_mode="radius")
    assert len(rec.points) == 100_000
    mapper = IncrementalMapper(MapperConfig())
    t0 = time.perf_counter()
    n = mapper.merge_tracks(rec, thr)
    dt = time.perf_counter() - t0
    assert n == len(split_pairs), (n, len(split_pairs))
    assert dt < 60.0, f"merge pass took {dt:.1f}s at 100k points"
