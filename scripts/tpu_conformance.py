"""TPU conformance report: golden-label F1 for the shipped configs.

Runs the full pipeline on the current backend (intended: the real TPU chip)
for both shipped dataset configs (TUM fr3 default ini, ICL-NUIM ini), with
stage 1 on the fused Pallas depth->moments kernel AND on the XLA path, and
reports:

  * plane-label F1 vs the C++ reference goldens (data/golden/*.npz) —
    north-star bound >= 0.95 (BASELINE.json);
  * found-plane counts (reference: exactly 34 on TUM default,
    cpp/tests/test_plane_extractor.cpp:31);
  * whether the two stage-1 paths agree bit-for-bit (they compute the same
    banded anchored MXU reduction — cellstats._moments_matmul is the
    kernel's XLA mirror; bit-equality holds on TPU, while CPU XLA's
    per-program FMA contraction makes it ulp-approximate there).

Writes data/golden/tpu_conformance.json and prints one JSON line.

Usage:  python scripts/tpu_conformance.py  [--out data/golden/tpu_conformance.json]
"""

import argparse
import json
import os
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np


def label_f1(pred, gold):
    """Greedy per-gold-plane matched F1 (same metric as tests/conftest.py)."""
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
    precision = tp / max(int((pred > 0).sum()), 1)
    recall = tp / max(int((gold > 0).sum()), 1)
    return 2 * precision * recall / max(precision + recall, 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "data" / "golden" / "tpu_conformance.json"))
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from deplex_tpu import Config
    from deplex_tpu.parallel.batch import extract_depth_batch
    from deplex_tpu.utils import DepthImage, read_intrinsics

    backend = jax.default_backend()
    configs = [
        ("tum_fr3_default", "tum/1341848230.910894.png",
         "TUM_fr3_long_val.K", None, "tum_default_labels"),
        ("icl_ini", "icl_nuim/0.png",
         "ICL_living_room.K", "ICL_living_room.ini", "icl_ini_labels"),
    ]
    report = {"backend": backend, "configs": {}}
    ok = True
    for name, png, kfile, ini, golden in configs:
        img = DepthImage(str(ROOT / "data" / png))
        K = jnp.asarray(np.asarray(
            read_intrinsics(str(ROOT / "data" / "configs" / kfile)), np.float32))
        cfg = Config.from_ini(str(ROOT / "data" / "configs" / ini)) if ini else Config()
        gold = np.load(ROOT / "data" / "golden" / f"{golden}.npz")["labels"]
        depth = jnp.asarray(img.data)[None]

        entry = {}
        labels = {}
        for path_name, flag in [("pallas", True), ("xla", False)]:
            c = dataclasses.replace(cfg, use_pallas_cellstats=flag)
            lab = np.asarray(jax.jit(
                lambda d, k, c=c: extract_depth_batch(d, k, c))(depth, K))[0]
            labels[path_name] = lab
            entry[path_name] = {
                "f1": round(label_f1(lab, gold), 4),
                "planes": int(lab.max()),
            }
            ok &= entry[path_name]["f1"] >= 0.95
        entry["paths_bit_equal"] = bool((labels["pallas"] == labels["xla"]).all())
        if backend == "tpu":
            ok &= entry["paths_bit_equal"]
        report["configs"][name] = entry

    report["pass"] = bool(ok)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
