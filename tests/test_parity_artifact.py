"""Fast gate on the committed full-suite parity artifact.

The full 50-dataset PyTorch battery (test_e2e_parity.py, slow-marked) is
pinned once per change to the suite config by
``scripts/run_parity_suite.py`` into ``PARITY_RESULTS.json``. This test runs
in every non-slow pass and asserts the artifact (a) exists, (b) was produced
by the CURRENT suite config — a drifted fingerprint means someone changed the
suite without re-running it — and (c) meets the reference's own thresholds
(e2e.test.scala:313-314: mean accuracy gap < 0.1, r^2 > 0.3).
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "PARITY_RESULTS.json")


def _load():
    assert os.path.exists(ARTIFACT), (
        "PARITY_RESULTS.json missing — run scripts/run_parity_suite.py"
    )
    with open(ARTIFACT) as fh:
        return json.load(fh)


def test_parity_artifact_meets_reference_thresholds():
    doc = _load()
    assert doc["mean_accuracy_gap"] < 0.1, doc["mean_accuracy_gap"]
    assert doc["r2"] > 0.3, doc["r2"]
    assert len(doc["datasets"]) >= 20

    # aggregate numbers must be reproducible from the per-dataset records
    ours = np.asarray([r["ours"] for r in doc["datasets"]])
    theirs = np.asarray([r["torch"] for r in doc["datasets"]])
    np.testing.assert_allclose(
        np.abs(ours - theirs).mean(), doc["mean_accuracy_gap"], atol=1e-9
    )
    np.testing.assert_allclose(
        np.corrcoef(ours, theirs)[0, 1] ** 2, doc["r2"], atol=1e-9
    )


def test_parity_artifact_matches_current_config():
    """A stale artifact (suite hyperparameters or dataset roster changed
    since the recorded run) must fail loudly, not silently vouch for the
    wrong configuration."""
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from run_parity_suite import config_fingerprint

    import test_e2e_parity as suite

    doc = _load()
    names = [d[0] for d in suite._datasets()]
    _, fp = config_fingerprint(names, suite.MAX_ROWS)
    assert doc["config_fingerprint"] == fp, (
        f"artifact fingerprint {doc['config_fingerprint']} != current {fp}; "
        "re-run scripts/run_parity_suite.py"
    )


def test_fullsize_parity_artifact():
    """The full-scale (no row subsampling) battery pinned by
    ``run_parity_suite.py --full`` must also meet the reference thresholds
    and match the current config once it exists."""
    full = os.path.join(ROOT, "PARITY_RESULTS_FULL.json")
    assert os.path.exists(full), (
        "PARITY_RESULTS_FULL.json missing — run "
        "scripts/run_parity_suite.py --full"
    )
    with open(full) as fh:
        doc = json.load(fh)
    assert doc["mean_accuracy_gap"] < 0.1, doc["mean_accuracy_gap"]
    assert doc["r2"] > 0.3, doc["r2"]
    assert doc["config"]["max_rows"] in (0, None)

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from run_parity_suite import config_fingerprint

    import test_e2e_parity as suite

    names = [d[0] for d in suite._datasets()]
    _, fp = config_fingerprint(names, 0)
    assert doc["config_fingerprint"] == fp, (
        f"full-size artifact fingerprint {doc['config_fingerprint']} != "
        f"current {fp}; re-run scripts/run_parity_suite.py --full"
    )
