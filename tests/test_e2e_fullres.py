"""FULL-RESOLUTION end-to-end inference on the real TPU chip.

Promotes the bench path into a test (VERDICT r1 #6): 256^2 photos ->
128^3 voxels through the complete GenRe + ShapeHD test pipelines on the
reference's bundled fixture images (scripts/test_genre.sh,
test.py:93-95), asserting finite outputs, sane occupancy, and .obj
emission.

The CPU test suite (conftest forces JAX_PLATFORMS=cpu) SKIPS these; run
them on the chip directly:

    python tests/test_e2e_fullres.py        # bypasses conftest, uses TPU

(as wired into .claude/skills/verify.)  Weights are freshly initialized --
this validates the full-resolution pipeline, not reconstruction quality.
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

GENRE_FIXTURES = "/root/reference/downloads/data/test/genre"
SHAPEHD_FIXTURES = "/root/reference/downloads/data/test/shapehd"


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


pytestmark = [
    pytest.mark.tpu,
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(GENRE_FIXTURES),
                       reason="reference fixtures not mounted"),
    pytest.mark.skipif(not _on_tpu(),
                       reason="full-resolution e2e needs the TPU chip"),
]


def full_opt(**kw):
    from genre_shapehd_tpu.models.base import default_opt
    return default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                       padding_margin=16, batch_size=1, vis_workers=2,
                       workers=2, dtype="bfloat16", **kw)


def _init_ckpt(model, path):
    from genre_shapehd_tpu.core.checkpoint import save_checkpoint
    state = model.init_state(jax.random.PRNGKey(0))
    names = model.net_names
    save_checkpoint(path, {
        "nets": [{"params": state.params[n],
                  "batch_stats": state.batch_stats.get(n, {})}
                 for n in names],
        "optimizers": [state.opt_state[o] for o in model.optimizer_names],
        "epoch": 0, "loss_eval": 1.0,
        "net_names": names, "opt_names": model.optimizer_names})


def _check_outputs(outdir, key, n_expected):
    npzs = sorted(glob.glob(os.path.join(outdir, "batch*.npz")))
    assert len(npzs) == n_expected, npzs
    any_surface = False
    for f in npzs:
        # the .npz must round-trip through PLAIN numpy (catches bf16
        # arrays leaking into artifacts)
        saved = np.load(f, allow_pickle=True)
        vox = np.asarray(saved[key])
        assert vox.dtype.kind == "f", vox.dtype
        vox = vox.astype(np.float32)
        assert vox.shape[-3:] == (128, 128, 128)
        assert np.isfinite(vox).all()
        occ = float((1.0 / (1.0 + np.exp(-vox.astype(np.float64)))
                     > 0.25).mean())
        assert 0.0 <= occ <= 1.0, occ
        any_surface |= 0.0 < occ < 1.0
    # fresh random weights give near-uniform sigmoid ~0.5 (> the 0.25
    # iso threshold everywhere) -- then there is legitimately no surface
    # and the visualizer must simply not crash; when a surface exists it
    # must be dumped as .obj
    if any_surface:
        objs = glob.glob(os.path.join(outdir, "*.obj"))
        assert objs, "visualizer emitted no .obj files"


def test_genre_fullres_on_chip(tmp_path):
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader

    enable_compile_cache()
    opt = full_opt()
    ckpt = str(tmp_path / "genre.pt")
    _init_ckpt(get_model("genre_full_model")(opt), ckpt)

    test_opt = full_opt(
        net_file=ckpt, output_dir=str(tmp_path / "out"),
        input_rgb=os.path.join(GENRE_FIXTURES, "*_rgb.png"),
        input_mask=os.path.join(GENRE_FIXTURES, "*_silhouette.png"))
    mt = get_model("genre_full_model", test=True)(test_opt)
    ds = get_dataset("test")(test_opt, model=mt)
    assert len(ds) == 4
    loader = DataLoader(ds, 1, shuffle=False, num_workers=2, drop_last=False)
    for i, batch in enumerate(loader):
        out = mt.test_on_batch(i, batch)
        assert out["pred_voxel"].shape == (1, 128, 128, 128)
        assert np.isfinite(out["pred_voxel"]).all()
    mt.visualizer.pool.shutdown(wait=True)      # flush async .obj writes
    _check_outputs(str(tmp_path / "out"), "pred_voxel", 4)


def test_shapehd_fullres_on_chip(tmp_path):
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader

    enable_compile_cache()
    opt = full_opt(canon_sup=True, w_gan_loss=0.0)
    ckpt = str(tmp_path / "shapehd.pt")
    _init_ckpt(get_model("shapehd")(opt), ckpt)
    m1_opt = full_opt(pred_depth_minmax=True)
    m1_ckpt = str(tmp_path / "marrnet1.pt")
    _init_ckpt(get_model("marrnet1")(m1_opt), m1_ckpt)

    test_opt = full_opt(
        canon_sup=True, w_gan_loss=0.0, net_file=ckpt,
        marrnet1_file=m1_ckpt, output_dir=str(tmp_path / "out"),
        input_rgb=os.path.join(SHAPEHD_FIXTURES, "*_rgb.*"),
        input_mask=os.path.join(SHAPEHD_FIXTURES, "*_mask.png"))
    mt = get_model("shapehd", test=True)(test_opt)
    ds = get_dataset("test")(test_opt, model=mt)
    assert len(ds) == 3
    loader = DataLoader(ds, 1, shuffle=False, num_workers=2, drop_last=False)
    for i, batch in enumerate(loader):
        out = mt.test_on_batch(i, batch)
        assert np.isfinite(out["pred_voxel"]).all()
        assert out["pred_voxel"].shape == (1, 128, 128, 128)
    mt.visualizer.pool.shutdown(wait=True)
    _check_outputs(str(tmp_path / "out"), "pred_voxel", 3)


if __name__ == "__main__":
    # direct script mode: no conftest, real TPU backend
    sys.exit(pytest.main([__file__, "-v", "-p", "no:cacheprovider"]))
