"""3D voxel networks (Flax, NDHWC): decoder, generator, discriminator.

Counterparts of /root/reference/networks/networks.py:
  VoxelDecoder        (:25-61)  latent 200 -> 128^3 logits, nf 512 halving
  VoxelGenerator      (:64-104) z 200 -> 128^3 sigmoid, nf 64
  VoxelDiscriminator  (:107-144) 128^3 -> scalar critic, leaky 0.2
All are resolution-parametric (number of 2x stages = log2(res/4)) so tiny
configurations stage on a virtual CPU mesh; defaults match the reference's
128^3 exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import kaiming_normal, bn_scale_init


def _tp(k: int, p: int, op: int = 0):
    pad = (k - 1 - p, k - 1 - p + op)
    return (pad, pad, pad)


def _conv3d_stride1_via2d(x, w, dtype, wb=None):
    """VALID stride-1 3D conv as ONE 2D conv + shifted depth adds (exact).

    XLA's TPU lowering of 3-spatial-dim convolutions is far off its 2D
    conv path for small output widths.  Stacking the k depth taps into
    the output-channel dim runs one (kh, kw, cin, k*cout) 2D conv over
    every depth slice, then sums k shifted slices along depth -- same
    MACs (up to k-1 edge slices), much better measured throughput when
    cout is tiny (the U-Net's final 1-channel deconv: 3.3ms -> 1.7ms).

    x: (N, Dp, Hp, Wp, Cin) pre-padded; w: (k, k, k, Cin, Cout).
    Returns (N, Dp-k+1, Hp-k+1, Wp-k+1, Cout) in f32 accumulation.
    ``wb`` > 1 lane-packs the inner 2D conv (_conv2d_lanepack).
    """
    n, dp, hp, wp, cin = x.shape
    k, cout = w.shape[0], w.shape[-1]
    x2 = x.reshape(n * dp, hp, wp, cin)
    w2 = jnp.moveaxis(w, 0, 3).reshape(k, k, cin, k * cout).astype(dtype)
    # NOTE: no preferred_element_type here -- mixed f32-out/bf16-in convs
    # break the autodiff transpose; the MXU accumulates each 2D conv in
    # f32 internally.  The k depth adds run in the compute dtype: for bf16
    # models the f32 round-trip doubled the traffic of the biggest
    # intermediate for a <=0.4% quantization the network carries anyway
    acc_dt = jnp.float32 if dtype == jnp.float32 else dtype
    if wb is not None and wb > 1:
        t = _conv2d_lanepack(x2, w2, 1, 0, wb, dtype).astype(acc_dt)
    else:
        t = jax.lax.conv_general_dilated(
            x2, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(acc_dt)
    ho, wo = t.shape[1], t.shape[2]
    t = t.reshape(n, dp, ho, wo, k, cout)
    dout = dp - k + 1
    acc = t[:, 0:dout, :, :, 0]
    for kd in range(1, k):
        acc = acc + t[:, kd:kd + dout, :, :, kd]
    return acc


def _conv3d_stride2_via2d(x, w, p, dtype, wb=None):
    """Conv3d(k, s=2, p) as two per-depth-phase 2D convs (exact).

    Splits the depth axis into even/odd phases; each phase's k/2 depth
    taps become channel-stacked shifted views feeding one stride-2 2D
    conv.  FLOP-neutral vs the direct 3D conv, but avoids XLA's 3-spatial
    lowering, which measures 6x slower on the U-Net stem (k8, C_in=2,
    128^3: 5.9ms -> 0.7ms per batch-4 call).

    x: (N, D, H, W, Cin) with D even; w: (k, k, k, Cin, Cout).
    """
    n, d, hp, wp, cin = x.shape
    k, cout = w.shape[0], w.shape[-1]
    dout = d // 2
    phases = {0: [], 1: []}
    for kd in range(k):
        # input depth index = 2*do + kd - p = 2*(do + off) + ph
        ph = (kd - p) % 2
        phases[ph].append(((kd - p - ph) // 2, kd))
    acc = None
    for ph, taps in phases.items():
        xs = x[:, ph::2]
        offs = [o for o, _ in taps]
        omin, omax = min(offs), max(offs)
        xp = jnp.pad(xs, ((0, 0), (-omin, omax), (0, 0), (0, 0), (0, 0)))
        w2 = jnp.stack([w[kd] for _, kd in taps], axis=2).reshape(
            k, k, len(taps) * cin, cout).astype(dtype)
        views = [xp[:, (o - omin):(o - omin) + dout] for o, _ in taps]
        x2 = jnp.concatenate(views, axis=-1).reshape(
            n * dout, hp, wp, len(taps) * cin)
        # no preferred_element_type (see _conv3d_stride1_via2d)
        if wb is not None and wb > 1:
            t = _conv2d_lanepack(x2, w2, 2, p, wb, dtype).astype(
                jnp.float32 if dtype == jnp.float32 else dtype)
        else:
            t = jax.lax.conv_general_dilated(
                x2, w2, (2, 2), [(p, p)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(
                    jnp.float32 if dtype == jnp.float32 else dtype)
        t = t.reshape(n, dout, t.shape[1], t.shape[2], cout)
        acc = t if acc is None else acc + t
    return acc


def _conv3d_stride2_tapstack(x, w, p, dtype):
    """Conv3d(k, s=2, p) as ONE stride-2 2D conv with ALL depth taps
    stacked into the output-channel dim + k stride-2-aligned adds (exact).

    FLOP-equal to the per-phase split (_conv3d_stride2_via2d) -- the 2D
    conv runs over all D input slices instead of D/2 per phase twice --
    but the GEMM output width is k*cout instead of cout, which keeps the
    MXU lanes fed when cout is small (this U-Net family: cout 20..80).
    Selected per geometry by measurement (tools/probe_conv_impls.py).
    """
    n, d, hp, wp, cin = x.shape
    k, cout = w.shape[0], w.shape[-1]
    dout = d // 2
    x2 = x.reshape(n * d, hp, wp, cin)
    w2 = jnp.moveaxis(w, 0, 3).reshape(k, k, cin, k * cout).astype(dtype)
    t = jax.lax.conv_general_dilated(
        x2, w2, (2, 2), [(p, p)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(
            jnp.float32 if dtype == jnp.float32 else dtype)
    ho, wo = t.shape[1], t.shape[2]
    t = t.reshape(n, d, ho, wo, k, cout)
    tp = jnp.pad(t, ((0, 0), (k, k), (0, 0), (0, 0), (0, 0), (0, 0)))
    acc = None
    for kd in range(k):
        # input depth for output o at tap kd: 2*o + kd - p
        start = k + kd - p
        sl = tp[:, start:start + 2 * dout:2, :, :, kd]
        acc = sl if acc is None else acc + sl
    return acc


def _conv2d_lanepack(x2, w2, stride, pad, wb, dtype):
    """2D conv with cout packed to ~full MXU lanes by w-position blocking.

    XLA's TPU conv engine runs its implicit GEMM with N = C_out lanes; the
    U-Net's edge layers (C_out 8..20 after phase stacking) leave 84-94% of
    the MXU idle.  Rewrite: block ``wb`` adjacent output w-positions into
    the channel dim -- a conv with kernel width kw + s*(wb-1), stride s*wb
    and wb*cout output channels, where Wbig[:, s*j + kx, :, j*cout + co]
    = w2[:, kx, :, co].  Exact (the extra weights are zeros); costs a
    known FLOP inflation of (kw + s*(wb-1))/kw in exchange for wb-times
    wider lanes, which measures far ahead for small cout
    (tools/probe_lanepack.py).

    x2: (R, H, W, Cin) unpadded; stride/pad apply to both spatial dims.
    Output width is right-padded to a multiple of wb and sliced back.
    """
    r, h, w, cin = x2.shape
    kh, kw, _, cout = w2.shape
    wo = (w + 2 * pad - kw) // stride + 1
    wo_pad = -(-wo // wb) * wb
    # input span consumed by the blocked conv (= standard conv span for
    # wo_pad outputs); pad the extra columns with zeros on the right
    need = (wo_pad - 1) * stride + kw
    x2 = jnp.pad(x2, ((0, 0), (pad, pad), (pad, need - w - pad), (0, 0)))
    wbig = jnp.zeros((kh, kw + stride * (wb - 1), cin, wb * cout),
                     dtype)
    for j in range(wb):
        wbig = wbig.at[:, stride * j:stride * j + kw, :,
                       j * cout:(j + 1) * cout].set(w2.astype(dtype))
    t = jax.lax.conv_general_dilated(
        x2, wbig, (stride, stride * wb), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho = t.shape[1]
    t = t.reshape(r, ho, wo_pad // wb, wb, cout).reshape(
        r, ho, wo_pad, cout)
    return t[:, :, :wo]


def _conv3d_stride1_scan2d(xb, w, dtype):
    """VALID stride-1 3D conv as k accumulated per-depth-tap 2D convs.

    One (k, k, cin, cout) 2D conv per depth tap, accumulated in place --
    FLOP-equal to the direct conv with NO k*cout-wide t tensor.  The
    stacked2d variant materializes one (k*cout channels over the FULL
    depth); at the dec5 geometry (80->160 phase channels @ 33^3) that t
    round-trips ~4 GB of HBM.  Here each tap re-reads a shifted input
    slab instead -- k*input_bytes of reads, zero intermediate writes
    beyond the accumulator.

    x: (N, Dp, Hp, Wp, Cin) pre-padded; w: (k, k, k, Cin, Cout).
    """
    n, dp, hp, wp, cin = xb.shape
    k, cout = w.shape[0], w.shape[-1]
    dout = dp - k + 1
    acc = None
    for kd in range(k):
        xs = xb[:, kd:kd + dout].reshape(n * dout, hp, wp, cin)
        # no preferred_element_type (see _conv3d_stride1_via2d)
        t = jax.lax.conv_general_dilated(
            xs, w[kd].astype(dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(
                jnp.float32 if dtype == jnp.float32 else dtype)
        acc = t if acc is None else acc + t
    ho, wo = hp - k + 1, wp - k + 1
    return acc.reshape(n, dout, ho, wo, cout)


def _conv3d_stride1_gemm(xb, w, dtype):
    """VALID stride-1 3D conv as ONE 1x1 GEMM + k^3 shifted adds (exact).

    Full tap unfold: every tap's contribution for every input pixel comes
    out of a single (pixels, cin) x (cin, k^3*cout) matmul; the k^3
    shifted adds assemble outputs.  Only sensible for tiny k and cout
    (the U-Net's final deconvs), where the alternative GEMM width
    k*cout starves the MXU and the t tensor stays moderate.
    """
    n, dp, hp, wp, cin = xb.shape
    k, cout = w.shape[0], w.shape[-1]
    wflat = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(
        cin, k * k * k * cout).astype(dtype)
    t = jnp.einsum("ndhwc,ce->ndhwe", xb.astype(dtype), wflat,
                   preferred_element_type=jnp.float32).astype(
        jnp.float32 if dtype == jnp.float32 else dtype)
    t = t.reshape(n, dp, hp, wp, k, k, k, cout)
    dd, hh, ww = dp - k + 1, hp - k + 1, wp - k + 1
    acc = None
    for a in range(k):
        for b in range(k):
            for c in range(k):
                sl = t[:, a:a + dd, b:b + hh, c:c + ww, a, b, c]
                acc = sl if acc is None else acc + sl
    return acc


class SubpixelTConv3D(nn.Module):
    """ConvTranspose3d(k, s=2, p=k/2-1) as a subpixel (phase-decomposed)
    stride-1 conv -- exact same outputs, TPU-shaped compute.

    XLA lowers transposed convs via input dilation: the implicit GEMM runs
    at OUTPUT resolution over the full k^3 receptive field, so 7/8 of the
    MACs multiply inserted zeros, and the GEMM width is C_out (20-160 in
    this model family -- far under the 128-wide MXU).  Decomposing by
    output phase (o = 2j + phi per axis) turns it into ONE stride-1 VALID
    conv with (k/2)^3 taps and 8*C_out output channels followed by a
    depth-to-space interleave: 8x fewer FLOPs and a >=160-wide GEMM.
    Measured on the 128^3 3D U-Net: 40ms -> ~7ms per batch-4 forward.

    Parameter tree is identical to flax ConvTranspose (kernel (k,k,k,I,O),
    flax tap order, bias (O,)), so checkpoints and the torch conversion
    tables (tools/torch_layer_conversion.py) are unaffected; exactness vs
    ConvTranspose is pinned in tests/test_subpixel_deconv.py.

    ``impl`` picks the phase-conv realization ('auto' routes small
    phase-stacked widths through the 2D path, tiny final deconvs through
    the 1x1-GEMM tap unfold; choices grounded in
    tools/probe_conv_impls.py measurements).
    """
    features: int
    kernel: int
    use_bias: bool = True
    impl: str = "auto"    # auto | stacked2d | native3d | gemm1x1 | scan2d
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, o = self.kernel, self.features
        assert k % 4 == 0, "subpixel path expects k in {4, 8}"
        q, pad = k // 2, k // 4
        cin = x.shape[-1]
        w = self.param("kernel", kaiming_normal, (k, k, k, cin, o))
        phases = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
        # phase (a,b,c) uses flax-layout taps w[a::2, b::2, c::2] in order
        wcat = jnp.concatenate([w[a::2, b::2, c::2] for a, b, c in phases],
                               axis=-1).astype(self.dtype)
        xb = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)))
        impl = self.impl
        if impl == "auto":
            # measured per geometry (tools/probe_conv_impls.py, batch 8,
            # real chip): dec6 40->1@64 native 20.2ms / stacked2d 11.5 /
            # gemm1x1 12.1; dec5 80->20@32 native 11.4 / stacked2d 15.9;
            # dec4 320->40@16 native 4.1 / stacked2d 4.7 / gemm1x1 6.7.
            # stacked2d wins only when the phase-stacked width starves
            # the MXU AND k*8o stays below the input channel count
            # (t-tensor traffic <= input traffic)
            impl = "stacked2d" if 8 * o < 128 else "native3d"
        if impl == "gemm1x1":
            y = _conv3d_stride1_gemm(xb, wcat, self.dtype).astype(
                self.dtype)
        elif impl == "stacked2d":
            y = _conv3d_stride1_via2d(xb, wcat, self.dtype).astype(
                self.dtype)
        elif impl == "scan2d":
            y = _conv3d_stride1_scan2d(xb, wcat, self.dtype).astype(
                self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                xb, wcat, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        n, d1, d2, d3 = x.shape[:4]
        outs = [y[:, a:d1 + a, b:d2 + b, c:d3 + c,
                  i * o:(i + 1) * o]
                for i, (a, b, c) in enumerate(phases)]
        t = jnp.stack(outs, axis=-2)                  # (N,d1,d2,d3,8,O)
        t = t.reshape(n, d1, d2, d3, 2, 2, 2, o)
        t = t.transpose(0, 1, 4, 2, 5, 3, 6, 7)      # interleave phases
        out = t.reshape(n, 2 * d1, 2 * d2, 2 * d3, o)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (o,))
            out = out + bias.astype(self.dtype)
        return out


class Deconv3D(nn.Module):
    """ConvTranspose3d(k, s, p) equivalent (see revresnet.tconv_padding).

    The stride-2, p = k/2-1 cases (every 2x upsampling deconv in this
    model family) route through the exact subpixel decomposition
    (SubpixelTConv3D); other geometries use flax ConvTranspose."""
    features: int
    kernel: int = 4
    stride: int = 1
    torch_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if (self.stride == 2 and self.kernel in (4, 8)
                and self.torch_padding == self.kernel // 2 - 1):
            return SubpixelTConv3D(
                self.features, self.kernel, use_bias=self.use_bias,
                dtype=self.dtype, name="ConvTranspose_0")(x)
        return nn.ConvTranspose(
            self.features, (self.kernel,) * 3, strides=(self.stride,) * 3,
            padding=_tp(self.kernel, self.torch_padding),
            use_bias=self.use_bias, kernel_init=kaiming_normal,
            dtype=self.dtype)(x)


class DepthPhaseConv3D(nn.Module):
    """Conv3d(k, s=2, p=k/2-1) via _conv3d_stride2_via2d (exact).

    Param tree is identical to nn.Conv (kernel (k,k,k,I,O), bias (O,)),
    so checkpoints and the torch conversion tables are unaffected;
    exactness is pinned in tests/test_subpixel_deconv.py."""
    features: int
    kernel: int
    torch_padding: int
    use_bias: bool = True
    impl: str = "auto"          # auto | phase2d | tapstack2d
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", kaiming_normal,
                       (self.kernel,) * 3 + (cin, self.features))
        impl = self.impl
        if impl == "auto":
            # per-phase 2D wins every stride-2 geometry in this family
            # (tools/probe_conv_impls.py, batch 8, real chip: enc1 2->20
            # @128 phase2d 8.4ms / tapstack 31.7 / native 48.7; enc2
            # 20->40@64 phase2d 9.2 / tapstack 12.0 / native 11.6) --
            # tap-stacking widens the GEMM to k*cout lanes but pays k/2x
            # t-tensor traffic over the full (unstrided) depth
            impl = "phase2d"
        fn = (_conv3d_stride2_tapstack if impl == "tapstack2d"
              else _conv3d_stride2_via2d)
        y = fn(x.astype(self.dtype), w, self.torch_padding, self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


class Conv3D(nn.Module):
    """Conv3d(k, s, p) equivalent.

    Large-resolution stride-2 geometries (the U-Net stem and first
    middle level, every >=64^3 discriminator stage) route through the
    exact per-phase depth-decomposed 2D conv (_conv3d_stride2_via2d);
    smaller inputs stay on XLA's native path, which measures faster
    there.  Param tree matches nn.Conv (Conv_0/{kernel,bias})."""
    features: int
    kernel: int = 4
    stride: int = 2
    torch_padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if (self.stride == 2 and self.kernel in (4, 8)
                and self.torch_padding == self.kernel // 2 - 1
                and x.shape[1] >= 64 and x.shape[1] % 2 == 0):
            return DepthPhaseConv3D(
                self.features, self.kernel, self.torch_padding,
                use_bias=self.use_bias, dtype=self.dtype,
                name="Conv_0")(x)
        return nn.Conv(
            self.features, (self.kernel,) * 3, strides=(self.stride,) * 3,
            padding=self.torch_padding, use_bias=self.use_bias,
            kernel_init=kaiming_normal, dtype=self.dtype)(x)


def _bn(train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, scale_init=bn_scale_init(), dtype=dtype)


class VoxelDecoder(nn.Module):
    """latent (N, n_dims) -> (N, res, res, res) logits.

    networks.py:25-61: deconv(k4,VALID) to 4^3 at nf, then 2x deconvs
    halving channels each stage; final 2x deconv to 1 channel, no bn/act.
    """
    n_dims: int = 200
    nf: int = 512
    res: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool):
        stages = int(math.log2(self.res // 4))
        x = z.reshape(z.shape[0], 1, 1, 1, self.n_dims)
        x = Deconv3D(self.nf, 4, 1, 0, dtype=self.dtype)(x)       # -> 4^3
        x = nn.relu(_bn(train, self.dtype)(x))
        width = self.nf
        for _ in range(stages - 1):
            width //= 2
            x = Deconv3D(width, 4, 2, 1, dtype=self.dtype)(x)
            x = nn.relu(_bn(train, self.dtype)(x))
        x = Deconv3D(1, 4, 2, 1, dtype=self.dtype)(x)
        return x[..., 0]                                           # (N,X,Y,Z)


class VoxelGenerator(nn.Module):
    """noise (N, nz) -> (N, res, res, res) in (0,1).

    networks.py:64-104: nz -> nf*8 @4^3 -> ... -> nf @32^3, then for
    res=128 two extra stages (nf@64^3, 1@128^3), sigmoid.
    """
    nz: int = 200
    nf: int = 64
    res: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool):
        x = z.reshape(z.shape[0], 1, 1, 1, self.nz)
        x = Deconv3D(self.nf * 8, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(_bn(train, self.dtype)(x))
        widths = {128: (self.nf * 4, self.nf * 2, self.nf, self.nf),
                  64: (self.nf * 4, self.nf * 2, self.nf),
                  32: (self.nf * 2, self.nf)}[self.res]
        for w in widths:
            x = Deconv3D(w, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
            x = nn.relu(_bn(train, self.dtype)(x))
        x = Deconv3D(1, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
        return nn.sigmoid(x[..., 0])


class VoxelDiscriminator(nn.Module):
    """(N, res, res, res) -> (N,) Wasserstein critic scores.

    networks.py:107-144: k4 s2 p1 conv stack with LeakyReLU(0.2), no norm
    (WGAN-GP), final k4 VALID conv from 4^3 to a scalar.  res=128 inserts
    an extra nf->nf stage after the first conv (:132-137).
    """
    nf: int = 64
    res: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, train: bool = False):
        x = v[..., None]
        widths = {128: (self.nf, self.nf, self.nf * 2, self.nf * 4, self.nf * 8),
                  64: (self.nf, self.nf * 2, self.nf * 4, self.nf * 8),
                  32: (self.nf, self.nf * 2, self.nf * 4)}[self.res]
        for w in widths:
            x = Conv3D(w, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = Conv3D(1, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)  # 4^3 -> 1
        return x.reshape(v.shape[0])
