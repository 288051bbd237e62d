"""Colorize a point cloud by plane labels and visualize / save it.

Parity with the reference visualization script
(/root/reference/scripts/apply_labels.py:12-33): random color per plane id,
label 0 black. Open3D display is optional (gated import — not baked into
this image); without it the colored cloud is written as CSV
(x,y,z,r,g,b) for external viewers.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def colorize(points: np.ndarray, labels: np.ndarray, seed: int = 0):
    rng = np.random.default_rng(seed)
    ids = np.unique(labels)
    palette = {0: np.zeros(3)}
    for i in ids[ids > 0]:
        palette[int(i)] = rng.uniform(0.1, 1.0, 3)
    colors = np.stack([palette[int(l)] for l in labels])
    return colors


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("cloud_csv", help="point cloud CSV (x,y,z per row)")
    parser.add_argument("labels_csv", help="labels CSV (one int per row)")
    parser.add_argument("--out", default=None, help="write colored cloud CSV here")
    args = parser.parse_args()

    from deplex_tpu.utils import read_pcd_csv

    points = read_pcd_csv(args.cloud_csv)
    labels = np.loadtxt(args.labels_csv, dtype=np.int64).reshape(-1)
    colors = colorize(points, labels)

    try:
        import open3d as o3d

        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(points[labels >= 0])
        pcd.colors = o3d.utility.Vector3dVector(colors[labels >= 0])
        o3d.visualization.draw_geometries([pcd])
    except ImportError:
        out = args.out or "colored_cloud.csv"
        np.savetxt(out, np.hstack([points, colors]), delimiter=",", fmt="%g")
        print(f"open3d not available; wrote colored cloud to {out}")


if __name__ == "__main__":
    main()
