"""Reconstruction-quality gate for the MarrNet-2 / ShapeHD family.

Runs the driver behind QUALRUN_SHAPEHD_r04.md (tools/qualrun_shapehd.py)
at tiny scale on the virtual-CPU mesh: marrnet2 pretrain -> wgangp prior
-> shapehd critic finetune (the reference's train_marrnet2.sh ->
train_wgangp.sh -> finetune_shapehd.sh workflow, README.md:136-156), and
asserts both the pretrained and the GAN-finetuned nets clearly beat the
untrained baseline on held-out solid-voxel IoU.  This pins MarrNet-2 /
ShapeHD as *shape-learning* systems (not just loss-decreasing ones) and
covers the full cross-model checkpoint-composition path
(opt.marrnet2 / opt.gan loading, shapehd.py:64-81).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tiny_shapehd_family_beats_untrained(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "qualrun_shapehd.py"),
         "--tiny", "--cpu", "--steps_m2", "30", "--steps_gan", "2",
         "--steps_shd", "6", "--batch", "4", "--train_n", "32",
         "--workers", "2", "--eval_batches", "2", "--traj_batches", "1",
         "--w_gan_loss", "auto:0.25", "--logdir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    with open(tmp_path / "qualrun_shapehd.json") as f:
        rep = json.load(f)
    u, m, s = rep["untrained"], rep["marrnet2"], rep["shapehd"]
    assert u["iou_best"] < 0.15, u
    assert m["iou_best"] > 2.0 * max(u["iou_best"], 0.05), (u, m)
    # the critic-finetuned net keeps reconstructing (shapehd starts from
    # the marrnet2 weights; a short finetune with w_gan_loss 1e-3 must
    # not destroy the shape signal)
    assert s["iou_best"] > 2.0 * max(u["iou_best"], 0.05), (u, s)
    assert m["chamfer_mean"] < u["chamfer_mean"], (u, m)
