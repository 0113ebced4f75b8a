"""End-to-end inference smoke tests on the reference's bundled fixtures.

The reference ships 4 ShapeNet renders + silhouettes (genre) and 3 Pix3D
photos + masks (shapehd) exactly so the test scripts can run as
integration tests (README.md:72, 88-125).  We drive our test CLI path on
those images (read from the read-only reference mount) at reduced model
resolution with freshly initialized weights -- validating the full
photo -> crop -> predict -> visualize -> npz pipeline shape-wise.
"""

import os

import numpy as np
import jax
import pytest

from genre_shapehd_tpu.core.checkpoint import save_checkpoint
from genre_shapehd_tpu.core.registry import get_dataset, get_model
from genre_shapehd_tpu.data.loader import DataLoader
from genre_shapehd_tpu.models.base import default_opt

GENRE_FIXTURES = "/root/reference/downloads/data/test/genre"
SHAPEHD_FIXTURES = "/root/reference/downloads/data/test/shapehd"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GENRE_FIXTURES),
    reason="reference fixture images not mounted")


def tiny_opt(**kw):
    return default_opt(im_size=64, vox_res=32, sph_res=32, z_res=32,
                       padding_margin=16, batch_size=1, vis_workers=0,
                       workers=2, **kw)


def _init_ckpt(model, path, net_names=None):
    state = model.init_state(jax.random.PRNGKey(0))
    names = net_names or model.net_names
    save_checkpoint(path, {
        "nets": [{"params": state.params[n],
                  "batch_stats": state.batch_stats.get(n, {})}
                 for n in names],
        "optimizers": [state.opt_state[o] for o in model.optimizer_names],
        "epoch": 0, "loss_eval": 1.0,
        "net_names": names, "opt_names": model.optimizer_names})


def test_genre_full_on_reference_renders(tmp_path):
    opt = tiny_opt()
    train_model = get_model("genre_full_model")(opt)
    ckpt = str(tmp_path / "genre.pt")
    _init_ckpt(train_model, ckpt)

    test_opt = tiny_opt(
        net_file=ckpt, output_dir=str(tmp_path / "out"),
        input_rgb=os.path.join(GENRE_FIXTURES, "*_rgb.png"),
        input_mask=os.path.join(GENRE_FIXTURES, "*_silhouette.png"))
    mt = get_model("genre_full_model", test=True)(test_opt)
    ds = get_dataset("test")(test_opt, model=mt)
    assert len(ds) == 4
    loader = DataLoader(ds, 1, shuffle=False, num_workers=2, drop_last=False)
    for i, batch in enumerate(loader):
        out = mt.test_on_batch(i, batch)
        assert out["pred_voxel"].shape == (1, 32, 32, 32)
        assert np.isfinite(out["pred_voxel"]).all()
        if i >= 1:            # two photos are enough for a smoke test
            break
    assert os.path.isfile(str(tmp_path / "out" / "batch0000.npz"))
    saved = np.load(str(tmp_path / "out" / "batch0000.npz"),
                    allow_pickle=True)
    assert "pred_voxel" in saved


def test_shapehd_on_reference_photos(tmp_path):
    opt = tiny_opt(canon_sup=True, w_gan_loss=0.0)
    train_model = get_model("shapehd")(opt)
    ckpt = str(tmp_path / "shapehd.pt")
    _init_ckpt(train_model, ckpt)

    m1_opt = tiny_opt(pred_depth_minmax=True)
    m1 = get_model("marrnet1")(m1_opt)
    m1_ckpt = str(tmp_path / "marrnet1.pt")
    _init_ckpt(m1, m1_ckpt)

    test_opt = tiny_opt(
        canon_sup=True, w_gan_loss=0.0, net_file=ckpt,
        marrnet1_file=m1_ckpt, output_dir=str(tmp_path / "out"),
        input_rgb=os.path.join(SHAPEHD_FIXTURES, "*_rgb.*"),
        input_mask=os.path.join(SHAPEHD_FIXTURES, "*_mask.png"))
    mt = get_model("shapehd", test=True)(test_opt)
    ds = get_dataset("test")(test_opt, model=mt)
    assert len(ds) == 3
    loader = DataLoader(ds, 1, shuffle=False, num_workers=2, drop_last=False)
    batch = next(iter(loader))
    out = mt.test_on_batch(0, batch)
    assert out["pred_voxel"].shape == (1, 32, 32, 32)
    assert out["pred_voxel_noft"].shape == (1, 32, 32, 32)
    assert out["pred_depth"].shape[0] == 1
    assert os.path.isfile(str(tmp_path / "out" / "batch0000.npz"))
