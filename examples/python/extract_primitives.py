"""Planes + cylinders demo (CAPE's full primitive set).

The reference library extracts planes only; this example runs the extended
pipeline on a synthetic scene (cylinder in front of a wall) and on the TUM
sample frame, printing the fitted primitives.
"""

import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))            # deplex_tpu, from any cwd
sys.path.insert(0, str(ROOT / "tests"))  # the shared cylinder_scene fixture


def main():
    from test_cylinder import cylinder_scene

    from deplex_tpu import Config
    from deplex_tpu.pipeline import extract_primitives_jit

    pts, H, W = cylinder_scene()
    cfg = Config(patch_size=8, cylinder_extraction=True, max_planes=16,
                 min_region_growing_cells_activated=3,
                 min_region_growing_candidate_size=3,
                 max_region_growing_rounds=64,
                 depth_discontinuity_threshold=600.0)
    out = extract_primitives_jit(pts, image_height=H, image_width=W, config=cfg)
    cyl = out["cylinders"]
    n = int(cyl.nr_cylinders)
    print(f"planes: {int(np.asarray(out['plane_labels']).max())}, cylinders: {n}")
    for i in range(n):
        print(f"  cylinder {i + 1}: radius={float(cyl.radius[i]):.1f}mm "
              f"axis={np.asarray(cyl.axis[i]).round(3)} "
              f"rmse={float(cyl.rmse[i]):.2f}mm "
              f"cells={int(cyl.size[i])}")


if __name__ == "__main__":
    main()
