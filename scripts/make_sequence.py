"""Render a multi-frame 16-bit depth PNG sequence from the shipped TUM frame.

Writes N warped frames (deplex_tpu.utils.warp) plus the exact ground-truth
trajectory, in the layout the reference's sequence protocol expects
(a directory of sorted *.png — /root/reference/examples/process_sequence.cpp:23-28)
so the native SequenceLoader and examples/python/{process_sequence,run_slam}.py
can stream it.

Usage:
    python scripts/make_sequence.py --out /tmp/tum_seq --frames 30
"""

import argparse
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--image", default=str(ROOT / "data/tum/1341848230.910894.png"))
    ap.add_argument("--intrinsics", default=str(ROOT / "data/configs/TUM_fr3_long_val.K"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    from deplex_tpu.utils import DepthImage, read_intrinsics
    from deplex_tpu.utils.warp import render_sequence, smooth_trajectory

    img = DepthImage(args.image)
    K = np.asarray(read_intrinsics(args.intrinsics), np.float32)
    poses = smooth_trajectory(args.frames, seed=args.seed)
    frames = render_sequence(img.data, K, poses)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i, d in enumerate(frames):
        arr = np.clip(np.round(d), 0, 65535).astype(np.uint16)
        Image.fromarray(arr, mode="I;16").save(out / f"{i:06d}.png")
    np.savez(out / "trajectory_gt.npz",
             R=np.stack([R for R, _ in poses]),
             t=np.stack([t for _, t in poses]))
    # Provenance manifest: committed ATE artifacts must be regenerable
    # bit-for-bit (round-5 lesson: an artifact without its generation
    # parameters cannot be re-validated after a code change).
    import json

    (out / "manifest.json").write_text(json.dumps({
        "generator": "scripts/make_sequence.py",
        "image": str(pathlib.Path(args.image).resolve()),
        "intrinsics": str(pathlib.Path(args.intrinsics).resolve()),
        "frames": args.frames,
        "seed": args.seed,
    }, indent=2) + "\n")
    print(f"{args.frames} frames -> {out} (+ trajectory_gt.npz, manifest.json)")


if __name__ == "__main__":
    main()
