"""Single-frame plane extraction example.

Parity with the reference example (/root/reference/examples/python/process_cloud.py:8-26
and examples/process_cloud.cpp:25-37): load the TUM sample depth frame,
extract planes, print the plane count and FPS over repeated runs.
"""

import argparse
import pathlib
import time

ROOT = pathlib.Path(__file__).resolve().parents[2]

import sys

if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", type=int, default=10)
    parser.add_argument("--image", default=str(ROOT / "data/tum/1341848230.910894.png"))
    parser.add_argument("--intrinsics", default=str(ROOT / "data/configs/TUM_fr3_long_val.K"))
    parser.add_argument("--config", default=str(ROOT / "data/configs/TUM_fr3_long_val.ini"))
    args = parser.parse_args()

    from deplex_tpu import Config, PlaneExtractor
    from deplex_tpu.utils import DepthImage, read_intrinsics

    config = Config.from_ini(args.config)
    intrinsics = read_intrinsics(args.intrinsics)
    image = DepthImage(args.image)
    pcd = image.transform_to_pcd(intrinsics)

    algorithm = PlaneExtractor(image.height, image.width, config)
    labels = algorithm.process(pcd)  # warmup / compile

    start = time.perf_counter()
    for _ in range(args.runs):
        labels = algorithm.process(pcd)
    elapsed = (time.perf_counter() - start) / args.runs

    print(f"Found planes: {labels.max()}")
    print(f"Elapsed time (mks): {elapsed * 1e6:.0f}")
    print(f"FPS: {1.0 / elapsed:.1f}")


if __name__ == "__main__":
    main()
