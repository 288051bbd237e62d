"""Point-cloud / intrinsics file I/O.

Parity with deplex::utils::{readPointCloudCSV, readIntrinsics,
savePointCloudCSV} (cpp/deplex/src/deplex/utils/eigen_io.cpp:23-60).
"""

from __future__ import annotations

import numpy as np


def read_pcd_csv(path: str, delimiter: str = ",") -> np.ndarray:
    """Read an (N, 3) float32 point cloud from CSV."""
    data = np.loadtxt(path, delimiter=delimiter, dtype=np.float32)
    flat = data.reshape(-1)
    if flat.size % 3 != 0:
        raise RuntimeError("Error reading file: Invalid points shape")
    return flat.reshape(-1, 3)


def read_intrinsics(path: str) -> np.ndarray:
    """Read a whitespace-separated 3x3 intrinsics matrix."""
    try:
        vals = np.loadtxt(path, dtype=np.float32)
    except OSError as e:
        raise RuntimeError(f"Error: Couldn't open intrinsics file {path}") from e
    K = np.asarray(vals, dtype=np.float32).reshape(3, 3)
    return K


def save_pcd_csv(points: np.ndarray, path: str) -> None:
    """Write an (N, M) array as CSV (reference CSVFormat: comma, newline)."""
    np.savetxt(path, np.asarray(points), delimiter=",", fmt="%g")


def save_labels_csv(labels: np.ndarray, path: str) -> None:
    """One label per line — format of the reference's DEBUG_DEPLEX dumps
    (plane_extractor.cpp:511-549), consumed by scripts/apply_labels.py."""
    np.savetxt(path, np.asarray(labels).reshape(-1), fmt="%d")
