"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Mirrors the multi-host test strategy from SURVEY.md §4: JAX's standard
fake-device flags stand in for a real TPU slice so sharding/collective code
paths execute without hardware (SURVEY.md: `xla_force_host_platform_device_count`).
Must set env vars BEFORE jax initializes a backend.
"""

import os
import pathlib as _pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache: the suite is compile-bound (dozens of unique
# (shape, config) signatures), so re-runs skip straight to execution.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(
    _pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The axon sitecustomize registers the TPU plugin at interpreter start and
# pins jax to it regardless of JAX_PLATFORMS in the environment; the config
# knob still wins, so set it explicitly (tests always run on the CPU mesh).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

DATA = pathlib.Path(__file__).resolve().parent.parent / "data"


@pytest.fixture(scope="session")
def tum_cloud():
    from deplex_tpu.utils import DepthImage, read_intrinsics

    img = DepthImage(str(DATA / "tum" / "1341848230.910894.png"))
    K = read_intrinsics(str(DATA / "configs" / "TUM_fr3_long_val.K"))
    return img.transform_to_pcd(K), img.height, img.width


@pytest.fixture(scope="session")
def tum_image():
    """Raw uint16 depth + intrinsics (for the fused depth-path kernels)."""
    from deplex_tpu.utils import DepthImage, read_intrinsics

    img = DepthImage(str(DATA / "tum" / "1341848230.910894.png"))
    K = read_intrinsics(str(DATA / "configs" / "TUM_fr3_long_val.K"))
    return img.data, K


@pytest.fixture(scope="session")
def icl_cloud():
    from deplex_tpu.utils import DepthImage, read_intrinsics

    img = DepthImage(str(DATA / "icl_nuim" / "0.png"))
    K = read_intrinsics(str(DATA / "configs" / "ICL_living_room.K"))
    return img.transform_to_pcd(K), img.height, img.width


def load_golden(name: str) -> np.ndarray:
    return np.load(DATA / "golden" / f"{name}.npz")["labels"]


def label_f1(pred: np.ndarray, gold: np.ndarray):
    """Plane-label F1 with greedy per-gold-plane matching (BASELINE.md metric)."""
    pred = np.asarray(pred).reshape(-1)
    gold = np.asarray(gold).reshape(-1)
    gold_ids, gold_counts = np.unique(gold[gold > 0], return_counts=True)
    order = np.argsort(-gold_counts)
    used = set()
    tp = 0
    for g in gold_ids[order]:
        overl = pred[(gold == g) & (pred > 0)]
        if overl.size == 0:
            continue
        ids, cnts = np.unique(overl, return_counts=True)
        for i in np.argsort(-cnts):
            if ids[i] not in used:
                used.add(ids[i])
                tp += int(cnts[i])
                break
    n_pred = int((pred > 0).sum())
    n_gold = int((gold > 0).sum())
    precision = tp / max(n_pred, 1)
    recall = tp / max(n_gold, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return f1, precision, recall
