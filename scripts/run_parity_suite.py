"""Run the FULL 50-dataset PyTorch parity battery once and pin the result.

VERDICT round 1 item 4: the headline parity numbers drifted between
builder-run reports because no committed artifact pinned them. This writes
``PARITY_RESULTS.json`` at the repo root with per-dataset accuracies, the
aggregate gap / r^2, and a config hash; the fast test
``tests/test_parity_artifact.py`` asserts the artifact exists, matches the
CURRENT suite config (so it cannot silently go stale), and meets the
reference's own thresholds (e2e.test.scala:313-314).

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/run_parity_suite.py
(~3 minutes on the 1-core box; run alone so timings don't interleave)

``--full`` drops the 2000-row subsampling (every dataset at the
reference's full scale, filter-capped at 20,000 rows) and writes
``PARITY_RESULTS_FULL.json`` instead — the large-N config the reference
trains (e2e.test.scala:205-209). Run once per round; takes ~15-40 min.
"""

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402

import test_e2e_parity as suite  # noqa: E402


def config_fingerprint(dataset_names, max_rows):
    """Hash of everything that affects the parity numbers: model/train
    hyperparameters, subsampling, and the dataset roster."""
    cfg = {
        "hidden": suite.HIDDEN,
        "epochs": suite.EPOCHS,
        "batch": suite.BATCH,
        "lr": suite.LR,
        "max_rows": max_rows,
        "datasets": list(dataset_names),
    }
    blob = json.dumps(cfg, sort_keys=True).encode()
    return cfg, hashlib.sha256(blob).hexdigest()[:16]


def main():
    full = "--full" in sys.argv[1:]
    t0 = time.time()
    datasets = suite._datasets(max_rows=0 if full else None)
    names = [d[0] for d in datasets]
    cfg, fp = config_fingerprint(names, 0 if full else suite.MAX_ROWS)
    print(f"{len(datasets)} datasets, config fingerprint {fp}")

    per_dataset = []
    for i, (name, x, y, xt, yt, classes) in enumerate(datasets):
        a_ours = float(suite._train_ours(x, y, xt, yt, classes, seed=0))
        a_torch = float(suite._train_torch(x, y, xt, yt, classes, seed=0))
        per_dataset.append({
            "name": name, "n_train": int(len(x)), "n_test": int(len(xt)),
            "features": int(x.shape[1]), "classes": int(classes),
            "ours": a_ours, "torch": a_torch,
        })
        print(f"[{i + 1}/{len(datasets)}] {name}: ours={a_ours:.3f} "
              f"torch={a_torch:.3f}", flush=True)

    ours = np.asarray([r["ours"] for r in per_dataset])
    theirs = np.asarray([r["torch"] for r in per_dataset])
    gap = float(np.abs(ours - theirs).mean())
    r2 = float(np.corrcoef(ours, theirs)[0, 1] ** 2)

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
    except OSError:
        rev = "unknown"

    doc = {
        "suite": "pytorch-parity (reference endtoendtest e2e.test.scala)",
        "thresholds": {"mean_gap_lt": 0.1, "r2_gt": 0.3},
        "mean_accuracy_gap": gap,
        "r2": r2,
        "config": cfg,
        "config_fingerprint": fp,
        "git_rev": rev,
        "wall_seconds": round(time.time() - t0, 1),
        "datasets": per_dataset,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "PARITY_RESULTS_FULL.json" if full else "PARITY_RESULTS.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"mean gap {gap:.4f} (< 0.1), r^2 {r2:.4f} (> 0.3) -> {out}")


if __name__ == "__main__":
    main()
