"""Forward parity of every Flax net against the ACTUAL reference modules.

The reference's torch networks (/root/reference/networks/{networks,uresnet,
revresnet}.py) are instantiated with random weights (torchvision stubbed for
the unused ``pretrained`` import, tools/torch_ref_loader.py), their
state_dicts converted by the tables in tools/torch_layer_conversion.py, and
the Flax twins' eval-mode forwards asserted to match torch within float32
tolerance.  This is the strongest checkpoint-conversion evidence available
without the released checkpoints: if these pass, released .pt weights load
bit-compatibly up to fp32 accumulation order.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_ref_loader import load_reference_networks  # noqa: E402
from torch_layer_conversion import (  # noqa: E402
    convert_image_encoder, convert_marrnet2_net, convert_unet3d,
    convert_uresnet_net, convert_voxel_decoder, convert_voxel_discriminator,
    convert_voxel_generator)

ref_networks, ref_uresnet, ref_revresnet = load_reference_networks()


def _randomize(module: "torch.nn.Module", seed: int) -> None:
    """Randomize BN affine + running stats (weights keep torch's default
    scale-controlled init, so deep forwards stay numerically tame)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _sd(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def _assert_close(got, want, tol=2e-4):
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(float(np.abs(want).max()), 1e-3)
    err = float(np.abs(got - want).max()) / scale
    assert err < tol, f"max relative error {err:.2e} (tol {tol})"


def _paths(tree) -> dict:
    """path -> shape tuple (works for arrays and ShapeDtypeStructs)."""
    return {jax.tree_util.keystr(k): tuple(v.shape) for k, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _assert_structure(init_thunk, params, stats):
    """Converted trees must match the module's own init tree exactly
    (paths AND shapes); jax.eval_shape makes this free of compute."""
    abstract = jax.eval_shape(init_thunk)
    want_p = _paths(abstract["params"])
    want_s = _paths(abstract.get("batch_stats", {}))
    got_p = _paths(params)
    got_s = _paths(stats)
    assert got_p == want_p, (
        f"params mismatch:\n missing {set(want_p) - set(got_p)}\n"
        f" extra {set(got_p) - set(want_p)}\n"
        f" shape diffs {[k for k in set(got_p) & set(want_p) if got_p[k] != want_p[k]]}")
    assert got_s == want_s, (
        f"batch_stats mismatch:\n missing {set(want_s) - set(got_s)}\n"
        f" extra {set(got_s) - set(want_s)}")


def nchw(x):
    return jnp.asarray(np.moveaxis(x.detach().numpy(), 1, -1))


def test_uresnet_net_parity():
    """uresnet.Net (uresnet.py:6-79) vs nn.UResNet, all three heads."""
    tnet = ref_uresnet.Net([3, 1, 1], ["normal", "depth", "silhou"])
    _randomize(tnet, 0)
    tnet.eval()
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tnet(x)

    from genre_shapehd_tpu.nn import UResNet
    params, stats = convert_uresnet_net(_sd(tnet),
                                        ("normal", "depth", "silhou"))
    fnet = UResNet(out_planes=(3, 1, 1),
                   layer_names=("normal", "depth", "silhou"))
    _assert_structure(
        lambda: fnet.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), train=False),
        params, stats)
    got = fnet.apply({"params": params, "batch_stats": stats}, nchw(x),
                     train=False)
    for k in ("normal", "depth", "silhou"):
        _assert_close(got[k], np.moveaxis(want[k].numpy(), 1, -1))


def test_uresnet_net_inpaint_parity():
    """uresnet.Net_inpaint (uresnet.py:82-145): 1-channel input, shared k8
    final deconv."""
    tnet = ref_uresnet.Net_inpaint([1], ["spherical"], input_planes=1)
    _randomize(tnet, 2)
    tnet.eval()
    x = torch.randn(1, 1, 96, 96, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = tnet(x)["spherical"]

    from genre_shapehd_tpu.nn import UResNet
    params, stats = convert_uresnet_net(_sd(tnet), ("spherical",))
    fnet = UResNet(out_planes=(1,), layer_names=("spherical",),
                   inpainting=True)
    got = fnet.apply({"params": params, "batch_stats": stats}, nchw(x),
                     train=False)["spherical"]
    _assert_close(got, np.moveaxis(want.numpy(), 1, -1))


def test_marrnet1_net_with_minmax_parity():
    """marrnet1.Net = uresnet.Net + decoder_minmax head off the encoder
    bottleneck (marrnet1.py:137-161).  256^2 input: the head's k4 conv
    needs the reference-scale 4^2 bottleneck."""
    tnet = ref_uresnet.Net([3, 1, 1], ["normal", "depth", "silhou"])
    # the exact decoder_minmax Sequential of models/marrnet1.py:141-154
    tnet.decoder_minmax = torch.nn.Sequential(
        torch.nn.Conv2d(512, 512, 2, stride=2),
        torch.nn.Conv2d(512, 512, 4, stride=1),
        torch.nn.Flatten(),
        torch.nn.Linear(512, 256),
        torch.nn.BatchNorm1d(256),
        torch.nn.ReLU(inplace=True),
        torch.nn.Linear(256, 128),
        torch.nn.BatchNorm1d(128),
        torch.nn.ReLU(inplace=True),
        torch.nn.Linear(128, 2),
    )
    _randomize(tnet, 4)
    tnet.eval()
    x = torch.randn(2, 3, 256, 256,
                    generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        want = tnet(x)
        want["depth_minmax"] = tnet.decoder_minmax(tnet.encoder_out)

    from genre_shapehd_tpu.nn import UResNet
    params, stats = convert_uresnet_net(
        _sd(tnet), ("normal", "depth", "silhou"), pred_depth_minmax=True)
    fnet = UResNet(out_planes=(3, 1, 1),
                   layer_names=("normal", "depth", "silhou"),
                   pred_depth_minmax=True)
    got = fnet.apply({"params": params, "batch_stats": stats}, nchw(x),
                     train=False)
    for k in ("normal", "depth", "silhou"):
        _assert_close(got[k], np.moveaxis(want[k].numpy(), 1, -1))
    _assert_close(got["depth_minmax"], want["depth_minmax"].numpy())


def test_image_encoder_parity():
    """networks.ImageEncoder (networks.py:6-22), 4-channel input."""
    tnet = ref_networks.ImageEncoder(4, encode_dims=200)
    _randomize(tnet, 6)
    tnet.eval()
    x = torch.randn(2, 4, 64, 64, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want = tnet(x)

    from genre_shapehd_tpu.nn import ResNet18Encoder
    params, stats = convert_image_encoder(_sd(tnet))
    got = ResNet18Encoder(encode_dims=200).apply(
        {"params": params, "batch_stats": stats}, nchw(x), train=False)
    _assert_close(got, want.numpy())


def test_voxel_decoder_parity():
    """networks.VoxelDecoder (networks.py:25-61): 200 -> 128^3 logits."""
    tnet = ref_networks.VoxelDecoder(n_dims=200, nf=512)
    _randomize(tnet, 8)
    tnet.eval()
    z = torch.randn(1, 200, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        want = tnet(z)[:, 0]                       # (N, 128, 128, 128) NCDHW

    from genre_shapehd_tpu.nn import VoxelDecoder
    params, stats = convert_voxel_decoder(_sd(tnet))
    _assert_structure(
        lambda: VoxelDecoder(n_dims=200, nf=512, res=128).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 200)), train=False),
        params, stats)
    got = VoxelDecoder(n_dims=200, nf=512, res=128).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(z.numpy()),
        train=False)
    _assert_close(got, want.numpy())


def test_voxel_generator_parity():
    """networks.VoxelGenerator res=128 (networks.py:64-104)."""
    tnet = ref_networks.VoxelGenerator(nz=200, nf=64, bias=False, res=128)
    _randomize(tnet, 10)
    tnet.eval()
    z = torch.randn(1, 200, 1, 1, 1,
                    generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        want = tnet(z)[:, 0]

    from genre_shapehd_tpu.nn import VoxelGenerator
    params, stats = convert_voxel_generator(_sd(tnet))
    got = VoxelGenerator(nz=200, nf=64, res=128).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(z.numpy().reshape(1, 200)), train=False)
    _assert_close(got, want.numpy(), tol=5e-4)     # sigmoid saturation


def test_voxel_discriminator_parity():
    """networks.VoxelDiscriminator res=128 (networks.py:107-144)."""
    tnet = ref_networks.VoxelDiscriminator(nf=64, bias=False, res=128)
    tnet.eval()
    v = torch.randn(2, 1, 128, 128, 128,
                    generator=torch.Generator().manual_seed(13))
    with torch.no_grad():
        want = tnet(v)

    from genre_shapehd_tpu.nn import VoxelDiscriminator
    params, _ = convert_voxel_discriminator(_sd(tnet))
    got = VoxelDiscriminator(nf=64, res=128).apply(
        {"params": params}, jnp.asarray(v.numpy()[:, 0]))
    _assert_close(got, want.numpy())


def test_unet3d_parity():
    """networks.Unet_3D (networks.py:147-190): 128^3 x 2ch -> 128^3."""
    tnet = ref_networks.Unet_3D(nf=20, in_channel=2)
    _randomize(tnet, 14)
    tnet.eval()
    x = torch.randn(1, 2, 128, 128, 128,
                    generator=torch.Generator().manual_seed(15))
    with torch.no_grad():
        want = tnet(x)[:, 0]

    from genre_shapehd_tpu.nn import UNet3D
    params, stats = convert_unet3d(_sd(tnet))
    _assert_structure(
        lambda: UNet3D(nf=20, res=128).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 128, 2)),
            train=False),
        params, stats)
    got = UNet3D(nf=20, res=128).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(x.numpy(), 1, -1)), train=False)
    _assert_close(got, want.numpy())


def test_marrnet2_net_parity():
    """marrnet2.Net composition (marrnet2.py:88-111): masked 2.5D cat ->
    ImageEncoder -> VoxelDecoder, via the reference's own submodules."""
    enc = ref_networks.ImageEncoder(4, encode_dims=200)
    dec = ref_networks.VoxelDecoder(n_dims=200, nf=512)
    _randomize(enc, 16)
    _randomize(dec, 17)
    enc.eval(), dec.eval()
    g = torch.Generator().manual_seed(18)
    depth = torch.rand(1, 1, 64, 64, generator=g) * 100
    normal = torch.rand(1, 3, 64, 64, generator=g) * 100
    silhou = torch.rand(1, 1, 64, 64, generator=g) * 100
    thres = 50.0
    is_bg = silhou <= thres
    d, n = depth.clone(), normal.clone()
    d[is_bg] = 0
    n[is_bg.repeat(1, 3, 1, 1)] = 0
    with torch.no_grad():
        want = dec(enc(torch.cat((d, n), 1)))[:, 0]

    from genre_shapehd_tpu.models.marrnet2 import Marrnet2Net
    sd = {**{f"encoder.{k}": v for k, v in _sd(enc).items()},
          **{f"decoder.{k}": v for k, v in _sd(dec).items()}}
    params, stats = convert_marrnet2_net(sd)
    got = Marrnet2Net(vox_res=128, silhou_thres=thres).apply(
        {"params": params, "batch_stats": stats},
        nchw(depth), nchw(normal), nchw(silhou), train=False)
    _assert_close(got, want.numpy())
