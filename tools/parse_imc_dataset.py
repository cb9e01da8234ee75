"""Parse IMC-2021-style phototourism scenes into the CLI's scene layout.

Parity with reference tools/parse_data/parse_IMC_dataset.py: each scene holds
set_100/images/ + calibration CSVs or a COLMAP model; we support the COLMAP-
model variant (sparse model under `sfm/` or `set_100/sfm`).

Usage: python tools/parse_imc_dataset.py --input IMC_ROOT --output OUT
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parse_eth3d_dataset import parse_scene  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    for scene in sorted(os.listdir(args.input)):
        sdir = os.path.join(args.input, scene)
        # IMC layouts keep the images NEXT TO the sparse model: scene/sfm ->
        # scene/images, scene/set_100/sfm -> scene/set_100/images.
        for sub, imgs in (
            ("sfm", "images"),
            (os.path.join("set_100", "sfm"), os.path.join("set_100", "images")),
        ):
            if os.path.isdir(os.path.join(sdir, sub)):
                print(f"parsing {scene} ({sub})")
                parse_scene(sdir, os.path.join(args.output, scene), sub,
                            img_subdir=imgs)
                break


if __name__ == "__main__":
    main()
