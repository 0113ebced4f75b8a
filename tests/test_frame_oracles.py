"""Frame-convention transforms validated against the reference's torch code.

SURVEY's risk register calls the permute/flip conventions between image,
camera and voxel frames "the most bug-prone part of the whole port"; until
now they were only self-consistency-tested.  Here each chain is run
through torch/numpy EXACTLY as the reference writes it (transcribed as the
oracle, per the validation pattern of SURVEY section 4) and compared to the
ops/model implementations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from genre_shapehd_tpu import ops
from genre_shapehd_tpu.models.base import ModelBase


def test_get_abs_depth_chain_matches_reference():
    """depth_pred_with_sph_inpaint.get_abs_depth (reference :133-142):
    /100, minmax denorm of (1 - d), silhouette zeroing, permute+flip."""
    rng = np.random.default_rng(0)
    n, h, w = 2, 12, 12
    depth100 = rng.random((n, 1, h, w)).astype(np.float32) * 100.0
    minmax = np.sort(rng.random((n, 2)).astype(np.float32) * 2 + 1, axis=1)
    silhou100 = (rng.random((n, 1, h, w)) > 0.4).astype(np.float32) * 100.0

    # --- torch oracle, verbatim chain ---
    t_depth = torch.tensor(depth100) / 100.0
    t_minmax = torch.tensor(minmax)
    dmin = t_minmax[:, 0][:, None, None, None]
    dmax = t_minmax[:, 1][:, None, None, None]
    t_abs = (1 - t_depth) * (dmax - dmin + 1e-4) + dmin   # to_abs_depth
    t_sil = torch.tensor(silhou100) / 100.0
    t_abs[t_sil < 0.5] = 0
    t_abs = t_abs.permute(0, 1, 3, 2)
    t_abs = torch.flip(t_abs, [2])
    want = t_abs.numpy()[:, 0]                            # (N, W, H)

    # --- this framework (channel-last) ---
    rel = 1.0 - jnp.transpose(jnp.asarray(depth100), (0, 2, 3, 1)) / 100.0
    abs_d = ModelBase.to_abs_depth(rel, jnp.asarray(minmax))
    sil = jnp.transpose(jnp.asarray(silhou100), (0, 2, 3, 1)) / 100.0
    abs_d = jnp.where(sil < 0.5, 0.0, abs_d)
    got = np.asarray(
        ops.coords.depth_image_to_cambp_frame(abs_d[..., 0]))

    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gt_voxel_preprocess_matches_reference():
    """genre_full_model.preprocess voxel chain (reference :86-97):
    transpose(0,2,1), flip(2), 2-iteration erosion surface."""
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(1)
    res = 24
    # a solid blob
    c = (np.arange(res) + 0.5) / res - 0.5
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    val_in = (x ** 2 / 0.09 + y ** 2 / 0.16 + z ** 2 / 0.04 <= 1.0
              ).astype(np.float32)

    # --- reference oracle, verbatim numpy chain ---
    val = np.transpose(val_in, (0, 2, 1))
    val = np.flip(val, 2)
    want_surface = val - scipy_nd.binary_erosion(
        val, structure=np.ones((3, 3, 3)), iterations=2).astype(float)
    want_surface = np.clip(want_surface, 0, 1)

    # --- this framework: host preprocess + in-graph shell ---
    from genre_shapehd_tpu.models import genre_full
    from genre_shapehd_tpu.models.base import default_opt
    model = genre_full.Model(default_opt(im_size=64, vox_res=res,
                                         sph_res=32, z_res=32))
    out = model.preprocess({"voxel": val_in}, mode="train")
    np.testing.assert_array_equal(out["voxel"], val)
    got_shell = np.asarray(ops.voxel.surface_from_solid_jax(
        jnp.asarray(out["voxel"])[None]))[0]
    np.testing.assert_allclose(got_shell, want_surface, atol=1e-6)


def test_testtime_voxel_fixups_match_reference():
    """The trimesh-path compensating flips (genre_full_model.py:220-231):
    transpose(3,4)+flip([3]) on (N,C,X,Y,Z) and the inverse applied to the
    prediction.  Our coords helpers must be exact torch twins, and
    composing fixup o unfixup must be identity."""
    rng = np.random.default_rng(2)
    v = rng.random((2, 1, 6, 6, 6)).astype(np.float32)
    t = torch.tensor(v)

    want_fix = torch.flip(torch.transpose(t, 3, 4), [3]).numpy()[:, 0]
    got_fix = np.asarray(ops.coords.voxel_swap_yz_flip_y(
        jnp.asarray(v[:, 0])))
    np.testing.assert_array_equal(got_fix, want_fix)

    want_unfix = torch.transpose(t.flip([3]), 3, 4).numpy()[:, 0]
    got_unfix = np.asarray(ops.coords.voxel_flip_y_swap_yz(
        jnp.asarray(v[:, 0])))
    np.testing.assert_array_equal(got_unfix, want_unfix)

    # the reference applies fixup to inputs and unfixup to the output so
    # the refine net sees a consistent frame: they must invert each other
    roundtrip = ops.coords.voxel_flip_y_swap_yz(
        ops.coords.voxel_swap_yz_flip_y(jnp.asarray(v[:, 0])))
    np.testing.assert_array_equal(np.asarray(roundtrip), v[:, 0])


def test_gt_voxel_train_frame_roundtrip_matches_reference():
    """gt_voxel_to_train_frame must equal the reference's np chain and
    train_frame_to_gt_voxel must invert it."""
    rng = np.random.default_rng(3)
    v = rng.random((5, 5, 5)).astype(np.float32)
    want = np.flip(np.transpose(v, (0, 2, 1)), 2)
    got = np.asarray(ops.coords.gt_voxel_to_train_frame(jnp.asarray(v)))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(ops.coords.train_frame_to_gt_voxel(jnp.asarray(got)))
    np.testing.assert_array_equal(back, v)
