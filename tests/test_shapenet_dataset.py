"""ShapeNet status-file dataset test with a synthesized on-disk tree."""

import os
from os.path import join

import numpy as np
import pytest

from genre_shapehd_tpu.core.registry import get_dataset, get_model
from genre_shapehd_tpu.data import preprocess as pp
from genre_shapehd_tpu.data.shapenet import CLASS_ALIASES
from genre_shapehd_tpu.models.base import default_opt


@pytest.fixture()
def shapenet_root(tmp_path):
    """Two chair items x two views; one view lacks the voxel -> dropped
    when voxels are required."""
    root = tmp_path / "shapenet"
    status = root / "status"
    os.makedirs(status)
    items = ["03001627/itemA/itemA_view000", "03001627/itemA/itemA_view001",
             "02958343/carB/carB_view000"]
    is_train = ["True", "True", "True"]
    has_rgb = ["True", "True", "True"]
    has_depth = ["True", "True", "True"]
    has_silhou = ["True", "True", "True"]
    has_normal = ["True", "True", "True"]
    has_vox = ["True", "False", "True"]
    has_minmax = ["True", "True", "True"]

    def write(name, lines):
        (status / name).write_text("\n".join(lines) + "\n")

    write("items_all.txt", items)
    write("is_train.txt", is_train)
    write("rgb.txt", has_rgb)
    write("depth.txt", has_depth)
    write("silhou.txt", has_silhou)
    write("normal.txt", has_normal)
    write("vox_rot.txt", has_vox)
    write("depth_minmax.txt", has_minmax)

    rng = np.random.default_rng(0)
    for item in items:
        d = root / os.path.dirname(item)
        os.makedirs(d, exist_ok=True)
        base = join(str(root), item)
        pp.imwrite_rgb(base + "_rgb.png", rng.random((32, 32, 3)))
        pp.imwrite_rgb(base + "_depth.png", rng.random((32, 32)))
        sil = np.zeros((32, 32)); sil[8:24, 8:24] = 1.0
        pp.imwrite_rgb(base + "_silhouette.png", sil)
        pp.imwrite_rgb(base + "_normal.png", rng.random((32, 32, 3)))
        np.save(base + ".npy", np.array([2.0, 2.4]))
        np.savez(base + "_gt_rotvox_samescale_128.npz",
                 voxel=(rng.random((16, 16, 16)) > 0.9).astype(np.float64))
    return str(root)


def test_shapenet_dataset_loads_and_filters(shapenet_root):
    opt = default_opt(im_size=32, vox_res=16, classes="chair",
                      data_root=shapenet_root)
    model = get_model("marrnet2")(opt)          # requires voxel
    ds = get_dataset("shapenet")(opt, "train", model=model)
    # itemA_view001 lacks its voxel -> only view000 remains; car excluded
    assert len(ds) == 1
    sample = ds[0]
    assert sample["rgb"].shape == (32, 32, 3)
    assert sample["depth"].shape == (32, 32, 1)
    assert sample["silhou"].shape == (32, 32, 1)
    assert sample["voxel"].shape == (16, 16, 16)
    assert sample["rgb"].dtype == np.float32
    # silhouette binarized at 0.999 then scaled by 100
    assert set(np.unique(sample["silhou"])) <= {0.0, 100.0}


def test_shapenet_class_alias_expansion(shapenet_root):
    opt = default_opt(im_size=32, vox_res=16, classes="drc",
                      data_root=shapenet_root)
    model = get_model("marrnet1")(opt)          # no voxel requirement
    ds = get_dataset("shapenet")(opt, "train", model=model)
    assert len(ds) == 3                         # chair x2 + car x1


def test_class_alias_tables_complete():
    assert len(CLASS_ALIASES["all"].split("+")) == 55
    assert "04379243" not in CLASS_ALIASES["all-but-table"]
    assert "03001627" not in CLASS_ALIASES["all-but-chair"]
    assert len(CLASS_ALIASES["all-but-table"].split("+")) == 54
