"""I/O utilities (parity with deplex.utils, python/deplex/utils/__init__.py:1)."""

from deplex_tpu.utils.depth_image import DepthImage
from deplex_tpu.utils.io import (read_intrinsics, read_pcd_csv, save_labels_csv,
                                 save_pcd_csv)

__all__ = ["DepthImage", "read_intrinsics", "read_pcd_csv", "save_labels_csv",
           "save_pcd_csv"]
