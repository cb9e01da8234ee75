"""Parse an ETH3D undistorted dataset into the scene layout the CLI reads.

Parity with reference tools/parse_data/parse_eth3d_dataset.py:34-46: for each
ETH3D training scene (images/ + a GT COLMAP model under
dslr_calibration_undistorted/), emit

    <out>/<scene>/images/            (symlinks)
    <out>/<scene>/poses/{img}.txt    4x4 world-to-camera
    <out>/<scene>/intrins/{img}.txt  3x3 K

Usage: python tools/parse_eth3d_dataset.py --input ETH3D_ROOT --output OUT
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat  # noqa: E402
from detectorfreesfm_tpu.data import colmap_io  # noqa: E402


def parse_scene(scene_dir: str, out_dir: str, model_subdir: str,
                img_subdir: str = "images"):
    model_dir = os.path.join(scene_dir, model_subdir)
    cams, images, _ = colmap_io.read_model(model_dir)
    img_root = os.path.join(scene_dir, img_subdir)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "poses"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "intrins"), exist_ok=True)
    n_linked = 0
    for im in images.values():
        src = os.path.join(img_root, im.name)
        flat = im.name.replace("/", "_")
        dst = os.path.join(out_dir, "images", flat)
        if not os.path.exists(dst) and os.path.exists(src):
            os.symlink(os.path.abspath(src), dst)
        if os.path.exists(dst):
            n_linked += 1
        stem = os.path.splitext(flat)[0]
        R = np_quat_to_rotmat(np.asarray(im.qvec, np.float64))
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = im.tvec
        np.savetxt(os.path.join(out_dir, "poses", f"{stem}.txt"), m)
        np.savetxt(
            os.path.join(out_dir, "intrins", f"{stem}.txt"),
            cams[im.camera_id].K(),
        )
    if n_linked == 0 and images:
        raise FileNotFoundError(
            f"no model image resolved under {img_root} — wrong img_subdir?"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--model-subdir", default="dslr_calibration_undistorted")
    args = ap.parse_args()
    for scene in sorted(os.listdir(args.input)):
        sdir = os.path.join(args.input, scene)
        if not os.path.isdir(os.path.join(sdir, args.model_subdir)):
            continue
        print(f"parsing {scene}")
        parse_scene(sdir, os.path.join(args.output, scene), args.model_subdir)


if __name__ == "__main__":
    main()
