"""Reconstruction-quality gate: the staged GenRe pipeline must beat the
untrained baseline on held-out procedural scenes.

Runs the same driver that produces QUALRUN_r03.md (tools/qualrun.py) at
tiny scale on the virtual-CPU mesh and asserts the trained model's
held-out surface IoU clearly exceeds the untrained one's.  This pins the
end-to-end geometry chain (cam_bp -> spherical render -> inpaint ->
spherical bp -> UNet3D refine, /root/reference/models/genre_full_model.py
:116-143) as a *shape-learning* system, not just a loss-decreasing one.

Step counts/thresholds are calibrated: see QUALRUN_r03.md for the
full-scale result these tiny numbers are a smoke proxy of.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tiny_staged_qualrun_beats_untrained(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "qualrun.py"),
         "--tiny", "--cpu", "--steps1", "120", "--steps2", "240",
         "--batch", "8", "--train_n", "64", "--workers", "2",
         "--eval_batches", "4", "--logdir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    with open(tmp_path / "qualrun.json") as f:
        rep = json.load(f)
    u, t = rep["untrained"], rep["trained"]
    # untrained nets sit near zero IoU (round-2 verdict's "trivial mean
    # predictor" bar); the trained one must be far above it
    assert u["iou_best"] < 0.15, u
    assert t["iou_best"] > 2.0 * max(u["iou_best"], 0.05), (u, t)
    assert t["chamfer_mean"] < u["chamfer_mean"], (u, t)
