"""MXU-native spherical renderer: ray sampling as dense matmuls.

The direct port of the reference renderer (ops/render_sph.py) probes the
voxel grid with ~1B scalar gathers (sph_res^2 * z_res points x 8 trilinear
corners) -- measured 1.7s/batch-4 on a v5e, 97% of full-GenRe inference.
Gathers are the worst op class on TPU; dense matmuls are the best.

Re-design: the ray-sample positions are STATIC and factor through
cylindrical coordinates.  A sample point is p = dir(phi, theta) * t with
dir = (sin(phi)cos(theta), sin(phi)sin(theta), cos(phi)), so

  stage 1 (per theta):   (x, y, z) -> (theta, rho, z)
      c[b, th, m, z] = sum_{x,y} vox[b, x, y, z]
                       * Wx[th, x, m] * Wy[th, y, m]
      where (x, y) targets are (rho_m cos th, rho_m sin th): 1-D hat
      (linear-interp) weights per axis, zero outside the cube
      (grid_sample zero padding).
  stage 2 (per phi):     (theta, rho, z) -> (phi, theta, t)
      out[b, ph, th, t] = sum_m ( sum_z c[b, th, m, z] * Wz[ph, z, t] )
                          * Wr[ph, m, t]
      where targets are rho = sin(ph) t', z-index of cos(ph) t'.

Every contraction is a dense matmul with static hat-function weight
matrices (one extra bilinear resampling through the rho grid is the only
approximation; rho is ~2x oversampled).  Total ~800 GFLOP at the
reference scale -- milliseconds on the MXU instead of seconds of gather.

Semantics match ops/render_sph.py (align_corners=True, zero padding,
clamp + first-hit expected depth); parity is tested in
tests/test_render_fast.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .sph import gen_sph_grid
from .stop_prob import stop_probability

RHO_RES = 192        # ~2x oversampled vs the 90.5-voxel cube half-diagonal


def _rho_max(vox_res: int) -> float:
    """Radial support of grid_sample's zero-padded trilinear hats: the
    boundary voxel's hat extends one voxel beyond the cube, so points up
    to sqrt(2) * (1 + 2/(V-1)) in the xy-plane can still sample nonzero."""
    return float(np.sqrt(2.0) * (1.0 + 2.0 / (vox_res - 1)))


def _hat_weights(targets: np.ndarray, size: int) -> np.ndarray:
    """(T,) continuous indices -> (size, T) linear-interp weight matrix.

    Out-of-range corners get zero weight (grid_sample zero padding,
    align_corners=True index convention handled by the caller).
    """
    t = np.asarray(targets, np.float64)
    lo = np.floor(t)
    frac = t - lo
    w = np.zeros((size, t.shape[0]), np.float64)
    cols = np.arange(t.shape[0])
    for corner, cw in ((lo, 1.0 - frac), (lo + 1.0, frac)):
        idx = corner.astype(np.int64)
        ok = (idx >= 0) & (idx < size)
        w[idx[ok], cols[ok]] += cw[ok]
    return w


@functools.lru_cache(maxsize=4)
def _stage_weights(vox_res: int, sph_res: int, z_res: int, rho_res: int):
    """Static weight tensors for both stages (numpy, computed once)."""
    v = vox_res
    phis = np.deg2rad(np.linspace(0, 180, sph_res * 2 + 1)[1::2])
    thetas = np.deg2rad(np.linspace(0, 360, sph_res + 1)[:-1])
    t_prime = 2.0 * (1.0 - np.linspace(0.0, 1.0, z_res))   # radius per step
    rho_max = _rho_max(v)
    rho = np.linspace(0.0, rho_max, rho_res)

    def to_idx(coord):
        # align_corners=True: [-1, 1] -> [0, v-1]
        return (coord + 1.0) * 0.5 * (v - 1)

    # stage 1: per theta, hat weights onto x and y for each rho node
    wx = np.zeros((sph_res, v, rho_res), np.float32)
    wy = np.zeros((sph_res, v, rho_res), np.float32)
    for k, th in enumerate(thetas):
        wx[k] = _hat_weights(to_idx(rho * np.cos(th)), v)
        wy[k] = _hat_weights(to_idx(rho * np.sin(th)), v)

    # stage 2: per phi, hat weights onto z (voxel axis) and rho nodes
    wz = np.zeros((sph_res, v, z_res), np.float32)
    wr = np.zeros((sph_res, rho_res, z_res), np.float32)
    rho_scale = (rho_res - 1) / rho_max
    for i, ph in enumerate(phis):
        wz[i] = _hat_weights(to_idx(np.cos(ph) * t_prime), v)
        wr[i] = _hat_weights(np.sin(ph) * t_prime * rho_scale, rho_res)
    return wx, wy, wz, wr


def sample_rays_mxu(vox: jnp.ndarray, sph_res: int = 128, z_res: int = 256,
                    rho_res: int = RHO_RES, chunk: int = 8,
                    compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """(N, V, V, V) volume -> (N, R, R, Z) ray samples via dense matmuls.

    Both stages are chunked over their angular axis with ``lax.map`` to
    bound the (B, chunk, rho, ...) intermediates to a few hundred MB.

    ``compute_dtype=bfloat16`` runs the contractions at full MXU rate with
    f32 accumulation (``preferred_element_type``): the operands are
    probabilities and hat weights in [0, 1], so bf16's ~0.4% quantization
    is far below the renderer's own rho-resampling error.  f32 inputs on
    v5e run the MXU in multi-pass mode at ~1/4 throughput.
    """
    v = vox.shape[1]
    wx, wy, wz, wr = _stage_weights(v, sph_res, z_res, rho_res)
    nch = sph_res // chunk
    assert nch * chunk == sph_res, (sph_res, chunk)
    cd = compute_dtype
    f32 = jnp.float32
    vox = vox.astype(cd)

    # stage 1: cylindrical resample, contracted x then (diagonal-in-m) y
    #   t1[b, th, m, y, z] = sum_x vox[b, x, y, z] wx[th, x, m]
    #   c [b, th, m, z]    = sum_y t1 * wy[th, y, m]
    wx_c = jnp.asarray(wx.reshape(nch, chunk, v, rho_res), cd)
    wy_c = jnp.asarray(wy.reshape(nch, chunk, v, rho_res), cd)

    def stage1(w):
        wxc, wyc = w
        t1 = jnp.einsum("bxyz,cxm->bcmyz", vox, wxc,
                        preferred_element_type=f32).astype(cd)
        return jnp.einsum("bcmyz,cym->bcmz", t1, wyc,
                          preferred_element_type=f32)

    c = jax.lax.map(stage1, (wx_c, wy_c))            # (nch, B, chunk, M, Z)
    c = jnp.moveaxis(c, 0, 1).reshape(
        vox.shape[0], sph_res, rho_res, v).astype(cd)

    # stage 2: z matmul then diagonal-in-s rho contraction
    #   t2[b, ph, th, m, s] = sum_z c[b, th, m, z] wz[ph, z, s]
    #   out[b, ph, th, s]   = sum_m t2 * wr[ph, m, s]
    wz_c = jnp.asarray(wz.reshape(nch, chunk, v, z_res), cd)
    wr_c = jnp.asarray(wr.reshape(nch, chunk, rho_res, z_res), cd)

    def stage2(w):
        wzc, wrc = w
        t2 = jnp.einsum("btmz,czs->bctms", c, wzc,
                        preferred_element_type=f32).astype(cd)
        return jnp.einsum("bctms,cms->bcts", t2, wrc,
                          preferred_element_type=f32)

    out = jax.lax.map(stage2, (wz_c, wr_c))          # (nch, B, chunk, T, S)
    return jnp.moveaxis(out, 0, 1).reshape(
        vox.shape[0], sph_res, sph_res, z_res)


def _use_pallas_default(vox_res: int, sph_res: int, z_res: int) -> bool:
    """Fused Pallas kernels run on real TPU backends only; the XLA einsum
    path serves CPU (tests, virtual meshes) and stays the parity oracle.

    Shape gate: the kernels' VMEM blocks need (8, 128)-tileable trailing
    dims (vox_res as a minor axis, z_res as the stage-2 output minor) and
    a square power-of-two angular grid -- reduced test resolutions fall
    back to the XLA path instead of failing in Mosaic."""
    import jax as _jax
    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    pow2 = (sph_res & (sph_res - 1)) == 0
    return vox_res % 128 == 0 and z_res % 128 == 0 and \
        sph_res % 8 == 0 and pow2


def render_spherical_fast(vox: jnp.ndarray, sph_res: int = 128,
                          z_res: int = 256, rho_res: int = RHO_RES,
                          compute_dtype: jnp.dtype = jnp.float32,
                          use_pallas: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for ops.render_spherical (same contract).

    On TPU with bf16 compute the ray sampling runs as fused Pallas
    kernels (ops/pallas/render_kernel.py), which cut the stage
    intermediates' HBM round-trips; elsewhere (or for f32) the chunked
    XLA einsum path is used.  Both are parity-tested against the exact
    gather renderer."""
    if use_pallas is None:
        use_pallas = (compute_dtype == jnp.bfloat16 and
                      _use_pallas_default(vox.shape[1], sph_res, z_res))
    if use_pallas:
        # fully fused: resampling + clip + stop-probability scan +
        # expected-depth reduction in one kernel chain; the (N, R, R, Z)
        # ray-sample tensor never reaches HBM
        from .pallas.render_kernel import render_expected_depth_pallas
        return render_expected_depth_pallas(
            vox.astype(jnp.float32), vox.shape[1], sph_res, z_res, rho_res)
    prob = sample_rays_mxu(vox.astype(jnp.float32), sph_res, z_res,
                           rho_res, compute_dtype=compute_dtype)
    prob = jnp.clip(prob, 1e-5, 1.0 - 1e-5)
    stop = stop_probability(prob, axis=-1)
    depth_w = jnp.linspace(0.0, 1.0, z_res, dtype=prob.dtype)
    exp_depth = jnp.einsum("nrsz,z->nrs", stop, depth_w)
    return exp_depth + jnp.prod(1.0 - prob, axis=-1)
