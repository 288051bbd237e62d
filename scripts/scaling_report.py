"""Multi-device scaling report: frames/s at each mesh size.

Runs the batched extraction pipeline with the frame axis sharded over 1, 2,
4, ... N devices and reports throughput + scaling efficiency (BASELINE.md's
1 chip / 1 host / N hosts protocol). On a multi-host slice, launch one
process per host with jax.distributed configured (deplex_tpu.parallel.
distributed.initialize); on a single chip this degenerates to the 1-device
row. Simulate a mesh on CPU with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_report.py --frames-per-device 4 --repeats 5
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames-per-device", type=int, default=8)
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument("--image", default=str(ROOT / "data/tum/1341848230.910894.png"))
    parser.add_argument("--intrinsics", default=str(ROOT / "data/configs/TUM_fr3_long_val.K"))
    args = parser.parse_args()

    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from deplex_tpu import Config
    from deplex_tpu.parallel.batch import extract_depth_batch_jit
    from deplex_tpu.parallel.distributed import initialize
    from deplex_tpu.utils import DepthImage, read_intrinsics

    initialize()
    devices = np.array(jax.devices())
    img = DepthImage(args.image)
    K = read_intrinsics(args.intrinsics)
    cfg = Config()

    sizes = []
    n = 1
    while n <= devices.size:
        sizes.append(n)
        n *= 2
    if sizes[-1] != devices.size:
        sizes.append(devices.size)

    base_fps = None
    rows = []
    for nd in sizes:
        mesh = Mesh(devices[:nd], axis_names=("data",))
        B = args.frames_per_device * nd
        batch = np.broadcast_to(img.data, (B,) + img.data.shape).copy()
        sharding = NamedSharding(mesh, P("data", None, None))
        x = jax.device_put(batch, sharding)
        out = extract_depth_batch_jit(x, np.asarray(K, np.float32), config=cfg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            jax.block_until_ready(
                extract_depth_batch_jit(x, np.asarray(K, np.float32), config=cfg))
        dt = (time.perf_counter() - t0) / args.repeats
        fps = B / dt
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * nd)
        rows.append({"devices": nd, "batch": B, "frames_per_sec": round(fps, 1),
                     "scaling_efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]))

    if jax.process_index() == 0:
        print(json.dumps({"report": rows}))


if __name__ == "__main__":
    main()
