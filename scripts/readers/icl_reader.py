"""ICL-NUIM dataset reader (parity with /root/reference/scripts/readers/icl_reader.py).

Default intrinsics are the ICL living-room calibration hardcoded by the
reference (icl_reader.py:9-13).
"""

import pathlib

import numpy as np

ICL_INTRINSICS = np.array(
    [[481.2, 0.0, 319.5], [0.0, -480.0, 239.5], [0.0, 0.0, 1.0]], dtype=np.float32)


class IclReader:
    def __init__(self, dataset_dir: str, intrinsics: np.ndarray | None = None):
        self.dir = pathlib.Path(dataset_dir)
        self.intrinsics = ICL_INTRINSICS if intrinsics is None else intrinsics
        self.frames = sorted(self.dir.glob("*.png"), key=lambda p: p.stem)

    def __len__(self):
        return len(self.frames)

    def __iter__(self):
        from deplex_tpu.utils import DepthImage

        image = DepthImage()
        for path in self.frames:
            image.reset(str(path))
            yield path.stem, image.transform_to_pcd(self.intrinsics)
