"""Pallas TPU kernel + XLA reformulations for the subpixel deconv tail.

The U-Net's subpixel deconvs (nn/voxel_nets.py::SubpixelTConv3D) end in a
phase-assembly chain -- 8 offset slices of the (S+1)^3 phase tensor, a
stack, a 7-D transpose and a reshape -- that XLA realizes as misaligned
copies over odd-sized (S+1) dims.  On the 128^3 U-Net this non-GEMM tail
dominates the final deconv (dec6, networks.py:166-167 geometry: ~7 ms
measured against a <1 ms compute floor, tools/probe_subpixel_pallas.py).

``deconv_final_fused`` replaces it for the C_out = 1 final deconv
(ConvTranspose3d(k=4, s=2, p=1)).  The contraction stays on XLA's 2D
conv engine (one (2,2,Cin,16) conv over all depth slices) and the two
shifted depth-tap adds stay XLA element-wise ops; the Pallas kernel
fuses the whole phase assembly: per output coarse-depth row it reads two
phase rows in a minor-merged (S+1, (S+1)*8) layout and emits finished
(2, 2S, 2S) interleaved output planes whose minor dim is the full 2S
lane width.  The 1-channel output never exists in its MXU/VPU-starving
8-lane phase form in HBM.

Mosaic cannot relayout arbitrary interleaves (sublane repeats, mid-shape
dim inserts, sublane-splitting reshapes and per-phase lane extracts all
either fail to compile or dominate the kernel), so the assembly is
expressed as plain 2D MXU matmuls against 0/1 selection matrices:

  lane side   srow_ab = y_a[b:b+S, :] @ G_ab, with
              G_ab[w'*8 + ph, 2k+cc] = [w' == k+cc][ph == 4a+2b+cc]
              (phase selection and 2x w-interleave in one dot);
  sublane side  plane_a = E_0^T srow_a0 + E_1^T srow_a1, with
              E_b[j, 2j+b] = 1 (2x v-interleave).

A permutation as a matmul is exact in any dtype (f32 accumulation of
0/1-weighted bf16 values) and runs at MXU rate (~20 MFLOP per output
plane-pair).

The op is linear; its backward is supplied via ``jax.custom_vjp`` from
``jax.vjp`` over the same math expressed in XLA (`_final_ref_xla`), so
it is train-compatible.  TPU-only at call sites (nn/voxel_nets.py
routes by backend); unit tests run interpreter mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phases8():
    return [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]


def _assemble_xla(y: jnp.ndarray, c: int) -> jnp.ndarray:
    """Reference assembly (the original slice/stack/transpose chain).

    (B, S+1, S+1, S+1, 8C) -> (B, 2S, 2S, 2S, C) with
    out[n, 2i+a, 2j+b, 2k+cc, o] = y[n, i+a, j+b, k+cc, (4a+2b+cc)C + o].
    """
    n, s1 = y.shape[0], y.shape[1]
    s = s1 - 1
    outs = [y[:, a:s + a, b:s + b, cc:s + cc, i * c:(i + 1) * c]
            for i, (a, b, cc) in enumerate(_phases8())]
    t = jnp.stack(outs, axis=-2).reshape(n, s, s, s, 2, 2, 2, c)
    t = t.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return t.reshape(n, 2 * s, 2 * s, 2 * s, c)


def _selection_mats(s: int, dtype):
    """The 0/1 matrices of the docstring: four G_ab ((S+1)*8, 2S) and the
    two transposed v-interleavers E_b^T (2S, S)."""
    s1 = s + 1
    gs = []
    for a in (0, 1):
        for b in (0, 1):
            g = np.zeros((s1 * 8, 2 * s), np.float32)
            for cc in (0, 1):
                ph = 4 * a + 2 * b + cc
                k = np.arange(s)
                g[(k + cc) * 8 + ph, 2 * k + cc] = 1.0
            gs.append(jnp.asarray(g, dtype))
    evt = []
    for b in (0, 1):
        e = np.zeros((s, 2 * s), np.float32)
        e[np.arange(s), 2 * np.arange(s) + b] = 1.0
        evt.append(jnp.asarray(e.T, dtype))
    return gs, evt


def _final_tail_kernel(y0_ref, y1_ref, g00_ref, g01_ref, g10_ref, g11_ref,
                       e0_ref, e1_ref, b_ref, out_ref, *, s: int):
    """Grid (B, S).  y* blocks (1,1,S+1,(S+1)*8) at phase-rows i and i+1;
    out block (1, 2, 2S, 2S): both output planes of coarse depth i."""
    g = ((g00_ref[...], g01_ref[...]), (g10_ref[...], g11_ref[...]))
    evt = (e0_ref[...], e1_ref[...])
    bias = b_ref[0]                                      # f32 scalar

    for a, y_ref in ((0, y0_ref), (1, y1_ref)):
        y = y_ref[0, 0]                                  # (S+1, (S+1)*8)
        plane = None
        for b in (0, 1):
            srow = jax.lax.dot(
                y[b:b + s, :], g[a][b],
                preferred_element_type=jnp.float32).astype(y.dtype)
            part = jax.lax.dot(evt[b], srow,
                               preferred_element_type=jnp.float32)
            plane = part if plane is None else plane + part
        out_ref[0, a] = (plane + bias).astype(out_ref.dtype)


def _final_fwd(x: jnp.ndarray, wcat: jnp.ndarray, bias: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """(B,S,S,S,Cin), (2,2,2,Cin,8), (1,) -> (B, 2S, 2S, 2S)."""
    n, s, cin = x.shape[0], x.shape[1], x.shape[-1]
    dt = x.dtype
    s1, sp = s + 1, s + 2
    xb = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    x2 = xb.reshape(n * sp, sp, sp, cin)
    w2 = jnp.moveaxis(wcat, 0, 3).reshape(2, 2, cin, 16).astype(dt)
    # one 2D conv over every depth slice, kd-major lanes; then the two
    # shifted depth-tap adds (see _conv3d_stride1_via2d -- no
    # preferred_element_type, bf16 adds for bf16 models)
    t = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(dt)
    t6 = t.reshape(n, sp, s1, s1, 2, 8)
    y = t6[:, :s1, :, :, 0, :] + t6[:, 1:, :, :, 1, :]   # (n,s1,s1,s1,8)
    yf = y.reshape(n, s1, s1, s1 * 8)

    gs, evt = _selection_mats(s, dt)
    cst = lambda shape: pl.BlockSpec(
        shape, lambda nn, i: tuple(0 for _ in shape))
    kern = functools.partial(_final_tail_kernel, s=s)
    return pl.pallas_call(
        kern,
        grid=(n, s),
        in_specs=[
            pl.BlockSpec((1, 1, s1, s1 * 8), lambda nn, i: (nn, i, 0, 0)),
            pl.BlockSpec((1, 1, s1, s1 * 8),
                         lambda nn, i: (nn, i + 1, 0, 0)),
            cst((s1 * 8, 2 * s)), cst((s1 * 8, 2 * s)),
            cst((s1 * 8, 2 * s)), cst((s1 * 8, 2 * s)),
            cst((2 * s, s)), cst((2 * s, s)),
            cst((1,)),
        ],
        out_specs=pl.BlockSpec((1, 2, 2 * s, 2 * s),
                               lambda nn, i: (nn, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * s, 2 * s, 2 * s), dt),
        interpret=interpret,
    )(yf, yf, *gs, *evt, bias.reshape(1).astype(jnp.float32))


def _final_ref_xla(x: jnp.ndarray, wcat: jnp.ndarray,
                   bias: jnp.ndarray) -> jnp.ndarray:
    """Same map expressed fully in XLA (reference + VJP donor)."""
    dt = x.dtype
    xb = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xb, wcat.astype(dt), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return _assemble_xla(y, 1)[..., 0] + bias.reshape(()).astype(dt)


@jax.custom_vjp
def deconv_final_fused(x: jnp.ndarray, wcat: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """(B,S,S,S,Cin), (2,2,2,Cin,8), (1,) -> (B, 2S, 2S, 2S)."""
    return _final_fwd(x, wcat, bias)


def _df_fwd(x, wcat, bias):
    return _final_fwd(x, wcat, bias), (x, wcat, bias)


def _df_bwd(res, g):
    x, wcat, bias = res
    _, vjp = jax.vjp(_final_ref_xla, x, wcat, bias)
    return vjp(g.astype(x.dtype))


deconv_final_fused.defvjp(_df_fwd, _df_bwd)
