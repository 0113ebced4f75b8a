"""Pallas TPU kernels for the MXU spherical renderer's ray sampling.

The XLA formulation (ops/render_sph_fast.py) is HBM-traffic-bound: its
two per-stage einsum pairs materialize ~200MB intermediates (t1/t2) per
angular chunk, ~13GB of HBM round-trips per batch-4 call -- measured
15.8ms, exactly the traffic prediction at 819 GB/s.  These kernels fuse
each stage's (matmul, diagonal-contraction) pair in VMEM so only the
(B, Th, M, V) cylindrical intermediate ever touches HBM.

Stage 1 (per theta, accumulated over x-chunks):
    c[th, m, b, z] = sum_x wx[th, x, m] * sum_y vox[y, b, x, z] wy[th, y, m]
Stage 2 (per phi):
    out[ph, th, b, s] = sum_m wr[ph, m, s] * sum_z c[th, m, b, z] wz[ph, z, s]

All dots are 2D with bf16 operands and f32 accumulation; every VMEM
block keeps a >=8x128-tileable trailing pair.  The map is linear, and
its custom VJP delegates to XLA's transpose of the einsum formulation
(measured faster than hand-written adjoint grids), so the renderer
trains end-to-end.

Array layouts are chosen so no kernel transposes anything: the host
wrapper pre-/post-transposes with XLA (HBM-speed copies).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render_sph_fast import _stage_weights

BF16 = jnp.bfloat16


@functools.lru_cache(maxsize=4)
def _pallas_weights_np(vox_res: int, sph_res: int, z_res: int,
                       rho_res: int):
    """bf16 numpy weight tensors in every orientation the kernels consume.

    Cached as NUMPY (via ml_dtypes) -- caching jnp arrays would leak
    tracers when first materialized inside a jit trace."""
    import ml_dtypes
    wx, wy, wz, wr = _stage_weights(vox_res, sph_res, z_res, rho_res)
    bf = ml_dtypes.bfloat16
    return {
        "wx_t": np.asarray(np.swapaxes(wx, 1, 2), bf),     # (Th, M, X)
        "wy_t": np.asarray(np.swapaxes(wy, 1, 2), bf),     # (Th, M, Y)
        "wz": np.asarray(wz, bf),                          # (Ph, Z, S)
        "wz_t": np.asarray(np.swapaxes(wz, 1, 2), bf),     # (Ph, S, Z)
        "wr": np.asarray(wr, bf),                          # (Ph, M, S)
    }


def _pallas_weights(vox_res: int, sph_res: int, z_res: int, rho_res: int):
    return {k: jnp.asarray(v)
            for k, v in _pallas_weights_np(vox_res, sph_res, z_res,
                                           rho_res).items()}


def _dense_w2(w):
    """Combined dense stage-1 weights W2[th, m, x*Y+y] = wx*wy for the
    dense reference kernel (_s1_call); ~0.8GB in-graph at full scale.
    The production path uses the block-sparse rectangles instead
    (_s1_sparse_call, ~113MB compact weights, ~7x fewer FLOPs)."""
    th, m, v = w["wx_t"].shape
    return (w["wx_t"][:, :, :, None]
            * w["wy_t"][:, :, None, :]).reshape(th, m, v * v)


@functools.lru_cache(maxsize=8)
def _s1_sparse_plan_np(vox_res: int, sph_res: int, z_res: int,
                       rho_res: int, tg: int = 1):
    """Block-sparse stage-1 plan: per (theta-group, rho-block) rectangles.

    W2[th, m, (x, y)] = wx[th,x,m] * wy[th,y,m] is hat-sparse: the (x, y)
    support of rho-block [m0, m0+MB) is the bounding rectangle of a ray
    SEGMENT -- at MB=64 of 192 rho nodes it spans <= |cos th|*31+2 voxels
    in x (resp. sin in y) of the full 128, so a fixed 48x48 window always
    covers it.  The dense kernel pays 16384-wide contractions and re-DMAs
    the whole volume per theta; the rectangles cut stage-1 FLOPs ~7x and
    HBM reads ~2.4x.

    ``tg`` groups consecutive thetas onto ONE shared rectangle: the
    window center moves by ~rho*sin(th)*dth per theta step, exactly where
    the span ~|cos th| shrinks, so the union window over 8 adjacent
    thetas is still 48x48 at full scale (measured: union span 40 vs 32
    single-theta).  Rectangle fetches -- the stage-1 DMA floor -- divide
    by ``tg`` while the per-step dot grows to (tg*MB, XW^2) x (XW^2, B*V),
    hiding the remaining traffic behind MXU work.

    Returns (x0s, y0s) int32 (Th//tg, NMB) window origins and compact
    weight factors wxc, wyc float32 (Th//tg, NMB, tg*MB, XW) with
    wxc[t, j, i*MB + m, dx] = wx[t*tg + i, x0s[t,j] + dx, j*MB + m].
    """
    wx, wy, _, _ = _stage_weights(vox_res, sph_res, z_res, rho_res)
    v = vox_res
    assert sph_res % tg == 0, (sph_res, tg)
    ntg = sph_res // tg
    mb = 64 if rho_res % 64 == 0 else rho_res
    nmb = rho_res // mb

    def plan(w):
        # w: (Th, V, M) -> group origins (Th//tg, NMB), max in-range span
        origins = np.zeros((ntg, nmb), np.int64)
        span = 1
        for t in range(ntg):
            for j in range(nmb):
                rows = np.nonzero(np.any(
                    w[t * tg:(t + 1) * tg][:, :, j * mb:(j + 1) * mb]
                    != 0.0, axis=(0, 2)))[0]
                if len(rows):
                    span = max(span, int(rows.max() - rows.min() + 1))
                    origins[t, j] = int(rows.min())
        return origins, span

    ox, sx = plan(wx)
    oy, sy = plan(wy)
    # Mosaic requires dynamic DMA origins in tiled dims to be 8-aligned:
    # floor origins to 8 and widen the window by the worst-case 7 slack.
    xw = min(v, -(-(max(sx, sy) + 7) // 16) * 16)   # shared square window
    ox = np.clip((ox // 8) * 8, 0, v - xw)
    oy = np.clip((oy // 8) * 8, 0, v - xw)

    def compact(w, origins):
        out = np.zeros((ntg, nmb, tg * mb, xw), np.float32)
        for t in range(ntg):
            for j in range(nmb):
                x0 = origins[t, j]
                for i in range(tg):
                    out[t, j, i * mb:(i + 1) * mb] = \
                        w[t * tg + i][x0:x0 + xw, j * mb:(j + 1) * mb].T
        return out

    # origins are stored pre-divided by 8 (they are 8-aligned above); the
    # kernel rescales, keeping the alignment provable to Mosaic
    return ((ox // 8).astype(np.int32), (oy // 8).astype(np.int32),
            compact(wx, ox), compact(wy, oy), mb, xw)


def _s1_sparse_tg(vox_res: int, sph_res: int, z_res: int, rho_res: int,
                  b: int):
    """Pick the theta-group size: the candidate minimizing total
    rectangle DMA (steps * window^2) whose VMEM footprint -- the
    double-buffered scratch plus the per-step weight/output/accumulator
    blocks -- stays within budget.  Returns None if none fit (callers
    fall back to the dense kernel)."""
    best = None
    for tg in (8, 4, 2, 1):
        if sph_res % tg:
            continue
        _, _, _, _, mb, xw = _s1_sparse_plan_np(vox_res, sph_res, z_res,
                                                rho_res, tg)
        bz = b * vox_res
        vmem = (2 * xw * xw * bz * 2          # double-buffered rectangles
                + tg * mb * xw * xw * 2       # w2c block (bf16)
                + tg * mb * bz * (2 + 4))     # out block + f32 accumulator
        if vmem > 14 * 2 ** 20:
            continue
        cost = (sph_res // tg) * xw * xw
        if best is None or cost < best[0]:
            best = (cost, tg)
    return None if best is None else best[1]


def _s1_sparse_kernel(x0_ref, y0_ref, vox3_ref, w2c_ref, c_ref, scratch,
                      sems):
    """c[theta-group, m-block] = W2c[group, mb] @ vox[rect(group, mb)].

    The shared support rectangle of ``tg`` consecutive thetas is DMA'd
    from the HBM-resident volume at the scalar-prefetched
    per-(theta-group, rho-block) origin; the contraction runs as one
    (tg*MB, XW*XW) x (XW*XW, B*V) MXU dot.  Rectangle fetches are
    double-buffered across grid steps: step i kicks off step i+1's copy
    before waiting on its own, overlapping HBM traffic with the dot.
    """
    it = pl.program_id(0)
    imb = pl.program_id(1)
    nmb = pl.num_programs(1)
    nsteps = pl.num_programs(0) * nmb
    flat = it * nmb + imb
    xw = scratch.shape[1]

    def rect_dma(step, slot):
        i_t, i_mb = step // nmb, step % nmb
        # origins are prefetched pre-divided by 8; the explicit *8 makes
        # the tiled-dim alignment provable to Mosaic (a bare dynamic
        # scalar is not)
        return pltpu.make_async_copy(
            vox3_ref.at[pl.ds(x0_ref[i_t, i_mb] * 8, xw),
                        pl.ds(y0_ref[i_t, i_mb] * 8, xw), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(flat == 0)
    def _():
        rect_dma(0, 0).start()

    @pl.when(flat + 1 < nsteps)
    def _():
        rect_dma(flat + 1, (flat + 1) % 2).start()

    rect_dma(flat, flat % 2).wait()
    gmb, bz = w2c_ref.shape[2], scratch.shape[3]
    block = scratch[flat % 2].reshape(xw * xw, bz)
    acc = jnp.dot(w2c_ref[0, 0], block,
                  preferred_element_type=jnp.float32)       # (tg*MB, B*Z)
    tg, mb, b = c_ref.shape[0], c_ref.shape[1], c_ref.shape[2]
    # (Th, M, B, V) output order: the natural (theta, m, b, v)
    # accumulator layout needs no in-kernel transpose
    c_ref[...] = acc.reshape(tg, mb, b, bz // b).astype(c_ref.dtype)


def _s1_sparse_call(vox3, b, vox_res, sph_res, z_res, rho_res, interpret,
                    tg=1):
    """vox3: (X, Y, B*Z) -> c: (Th, M, B, V) via support rectangles."""
    v = vox_res
    x0s, y0s, wxc, wyc, mb, xw = _s1_sparse_plan_np(
        vox_res, sph_res, z_res, rho_res, tg)
    ntg = sph_res // tg
    nmb = rho_res // mb
    # compact joint weights, computed in-graph (loop-invariant, hoisted);
    # ~113MB bf16 at full scale vs the dense form's 805MB
    w2c = (jnp.asarray(wxc, BF16)[:, :, :, :, None]
           * jnp.asarray(wyc, BF16)[:, :, :, None, :]).reshape(
               ntg, nmb, tg * mb, xw * xw)
    bz = vox3.shape[2]
    assert vox3.shape == (v, v, bz) and bz == b * v, (vox3.shape, b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntg, nmb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, tg * mb, xw * xw),
                         lambda it, imb, x0s, y0s: (it, imb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tg, mb, b, v),
                               lambda it, imb, x0s, y0s: (it, imb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, xw, xw, bz), BF16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _s1_sparse_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sph_res, rho_res, b, v), BF16),
        interpret=interpret,
    )(jnp.asarray(x0s), jnp.asarray(y0s), vox3, w2c)


def fused_render_cost(b: int, vox_res: int, sph_res: int = 128,
                      z_res: int = 256, rho_res: int = 192):
    """Analytic (flops, bytes) of one fused forward call
    (_s1_sparse_call + _s2scan_call) at batch ``b``.

    XLA's ``cost_analysis`` cannot see inside ``pallas_call``, so any
    roofline built on it alone under-counts the renderer by ~4x flops;
    bench.py adds these counts.  Formulas mirror the kernels above:
      stage 1: per (theta-group, rho-block): one (tg*MB, XW^2) x
        (XW^2, B*V) dot, reading the shared XWxXW rectangle + compact
        weights, writing (tg*MB, B*V).
      stage 2: per (theta-chunk, phi): one (tc*M*B, V) x (V, S) dot, the
        (tc*B, S) x (S, S) triangular scan dot, reading the wz/wr blocks
        (the c chunk stays resident across the inner phi sweep), writing
        the lane-padded (tc, B, 128) output.
    """
    v, th = vox_res, sph_res
    tg = _s1_sparse_tg(vox_res, sph_res, z_res, rho_res, b) or 1
    _, _, _, _, mb, xw = _s1_sparse_plan_np(vox_res, sph_res, z_res,
                                            rho_res, tg)
    nmb = rho_res // mb
    ntg = th // tg
    s1_macs = th * nmb * (mb * xw * xw * b * v)
    s1_bytes = 2 * (ntg * nmb * (xw * xw * b * v + tg * mb * xw * xw)
                    + th * rho_res * b * v)                 # bf16
    _, tc = _common_sizes(v, th, b)
    pts = (th // tc) * th
    s2_macs = pts * (tc * rho_res * b * v * z_res
                     + tc * b * z_res * z_res)              # dot + scan
    s2_bytes = (2 * (th * rho_res * b * v                   # c read once
                     + pts * (v * z_res + rho_res * z_res))  # wz + wr
                + 4 * th * th * b * 128)                    # padded out
    return 2.0 * (s1_macs + s2_macs), float(s1_bytes + s2_bytes)


def _s1_kernel(vox2_ref, w2_ref, c_ref, acc):
    """c[th, m, b*z] = W2[th] @ vox2, accumulated over xy-chunks."""
    ik = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ik == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(w2_ref[0], vox2_ref[:],
                      preferred_element_type=jnp.float32)  # (M, B*Z)

    @pl.when(ik == nk - 1)
    def _():
        m, bz = acc.shape
        b = c_ref.shape[1]
        c_ref[0] = jnp.swapaxes(
            acc[:].reshape(m, b, bz // b), 0, 1).astype(c_ref.dtype)


def _s2_kernel(c_ref, wz_ref, wr_ref, out_ref):
    """out[ph, th-chunk] from the resident c chunk (c: (Th, M, B, V))."""
    tc, m, b, v = c_ref.shape
    s = wz_ref.shape[2]
    c2 = c_ref[:].reshape(tc * m * b, v)
    t2 = jnp.dot(c2, wz_ref[0],
                 preferred_element_type=jnp.float32)     # (Tc*M*B, S)
    t2 = t2.reshape(tc, m, b, s)
    wrb = wr_ref[0].astype(jnp.float32)                  # (M, S)
    wq = jax.lax.broadcast_in_dim(wrb, t2.shape, (1, 3))
    out_ref[0] = jnp.sum(t2 * wq, axis=1)


def _common_sizes(v, sph_res, b=4):
    """VMEM-budgeted chunk sizes; scale down with batch so the resident
    blocks (vox chunk ~ kc*b*v bf16, stage-2 t2 ~ tc*b*m*s f32) stay
    within ~8MB each."""
    def pow2_floor(x):
        return 1 << (x.bit_length() - 1)

    # powers of two so the chunks divide the (power-of-two) grid dims
    kc = min(v * v, max(512, pow2_floor((4096 * 4) // max(b, 4))))
    tc = min(sph_res, max(1, pow2_floor(32 // max(b, 1))))
    return kc, tc


def _s1_call(vox2, b, w, sph_res, rho_res, interpret):
    """vox2: (X*Y, B*Z) -> c: (Th, B, M, V)."""
    xy, bz = vox2.shape
    v = bz // b
    kc, _ = _common_sizes(v, sph_res, b)
    # remainder chunks would be silently skipped by the grid floor-div:
    # unsupported shapes must fail loudly (render_sph_fast gates the
    # default route to supported shapes; this guards explicit callers)
    assert xy % kc == 0, (xy, kc)
    assert bz == b * v, (vox2.shape, b)
    return pl.pallas_call(
        _s1_kernel,
        grid=(sph_res, xy // kc),
        in_specs=[
            pl.BlockSpec((kc, bz), lambda it, ik: (ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rho_res, kc), lambda it, ik: (it, 0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, rho_res, v),
                               lambda it, ik: (it, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sph_res, b, rho_res, v), BF16),
        scratch_shapes=[pltpu.VMEM((rho_res, bz), jnp.float32)],
        interpret=interpret,
    )(vox2, _dense_w2(w))


def _s2_call(c, w, z_res, interpret):
    th, m, b, v = c.shape
    _, tc = _common_sizes(v, th, b)
    # the grid assumes a square (Ph == Th) angular grid and exact theta
    # chunking; fail loudly instead of dropping remainder chunks
    assert th % tc == 0, (th, tc)
    assert w["wz"].shape[0] == th, (w["wz"].shape, th)
    return pl.pallas_call(
        _s2_kernel,
        grid=(th // tc, th),        # (theta chunks, phi); Ph == Th
        in_specs=[
            pl.BlockSpec((tc, m, b, v), lambda it, ip: (it, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, z_res), lambda it, ip: (ip, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, z_res), lambda it, ip: (ip, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tc, b, z_res),
                               lambda it, ip: (ip, it, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((th, th, b, z_res), jnp.float32),
        interpret=interpret,
    )(c, w["wz"], w["wr"])


def _s2scan_kernel(c_ref, wz_ref, wr_ref, out_ref):
    """Fused stage 2 + first-hit scan: expected depth per (phi, theta, b).

    Extends _s2_kernel with the renderer's epilogue IN VMEM -- clip,
    stop-probability scan (exclusive prefix sums of log1p(-p) as one
    strictly-lower-triangular f32 matmul on the MXU) and the
    expected-depth reduction -- so the (B, R, R, Z) ray-sample tensor
    never exists in HBM (134MB + several scan passes per batch-8 call).
    Output lane width is a 128-padded singleton: [..., 0] holds E[depth]
    (+ background term), the rest zeros.
    """
    tc, m, b, v = c_ref.shape
    s = wz_ref.shape[2]
    c2 = c_ref[:].reshape(tc * m * b, v)
    t2 = jnp.dot(c2, wz_ref[0],
                 preferred_element_type=jnp.float32)     # (Tc*M*B, S)
    t2 = t2.reshape(tc, m, b, s)
    wrb = wr_ref[0].astype(jnp.float32)                  # (M, S)
    wq = jax.lax.broadcast_in_dim(wrb, t2.shape, (1, 3))
    p = jnp.sum(t2 * wq, axis=1)                         # (tc, b, S)
    p = jnp.clip(p, 1e-5, 1.0 - 1e-5)                    # reference clamp
    lg = jnp.log1p(-p)
    # cum[z] = sum_{z'<z} lg[z']: strictly-lower-triangular ones matmul
    # (f32 on the MXU; rows = tc*b = tiny, so multi-pass f32 is free)
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    ltri = (row < col).astype(jnp.float32)
    cum = jnp.dot(lg.reshape(tc * b, s), ltri,
                  preferred_element_type=jnp.float32).reshape(tc, b, s)
    stop = p * jnp.exp(cum)                              # first-hit prob
    zidx = jax.lax.broadcasted_iota(jnp.int32, (tc, b, s), 2)
    dw = zidx.astype(jnp.float32) / float(s - 1)
    bg = jnp.exp(jnp.sum(lg, axis=-1))                   # prod(1 - p)
    expd = jnp.sum(stop * dw, axis=-1) + bg              # (tc, b)
    width = out_ref.shape[3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tc, b, width), 2)
    expd_w = jax.lax.broadcast_in_dim(expd, (tc, b, width), (0, 1))
    out_ref[0] = jnp.where(lane == 0, expd_w, 0.0).astype(out_ref.dtype)


def _s2scan_call(c, w, z_res, interpret):
    th, m, b, v = c.shape
    _, tc = _common_sizes(v, th, b)
    assert th % tc == 0, (th, tc)
    assert w["wz"].shape[0] == th, (w["wz"].shape, th)
    out = pl.pallas_call(
        _s2scan_kernel,
        grid=(th // tc, th),        # (theta chunks, phi); Ph == Th
        in_specs=[
            pl.BlockSpec((tc, m, b, v), lambda it, ip: (it, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, z_res), lambda it, ip: (ip, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, z_res), lambda it, ip: (ip, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tc, b, 128),
                               lambda it, ip: (ip, it, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((th, th, b, 128), jnp.float32),
        interpret=interpret,
    )(c, w["wz"], w["wr"])
    return out[..., 0]                                   # (Ph, Th, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def render_expected_depth_pallas(vox, vox_res, sph_res=128, z_res=256,
                                 rho_res=192, interpret=False):
    """(N, V, V, V) clipped occupancy -> (N, R, R) expected-depth map,
    fully fused: stage-1/stage-2 resampling + stop-probability scan +
    depth reduction, with only the (Th, B, M, V) cylindrical intermediate
    and the tiny output touching HBM.

    Same semantics as ops.render_spherical / render_sph_fast's epilogue
    (clip to [1e-5, 1-1e-5], first-hit expectation, background ~1).
    Backward rematerializes through the XLA einsum formulation from the
    saved primal input (the scan is nonlinear; saving ray samples would
    defeat the traffic win), so training pays the fused forward plus the
    usual XLA backward.  Parity: tests/test_pallas_render.py.
    """
    return _render_expd_fwd(vox, vox_res, sph_res, z_res, rho_res,
                            interpret)[0]


def _s1_auto(vox, b, v, w, sph_res, z_res, rho_res, interpret):
    """Sparse stage 1 (largest theta group whose blocks fit VMEM,
    ~16MB/core); the dense kernel (whose chunk sizes scale down with
    batch) otherwise.  Both emit (Th, M, B, V)."""
    tg = _s1_sparse_tg(v, sph_res, z_res, rho_res, b)
    if tg is not None:
        vox3 = jnp.transpose(vox.astype(BF16), (1, 2, 0, 3)).reshape(
            v, v, b * v)
        return _s1_sparse_call(vox3, b, v, sph_res, z_res, rho_res,
                               interpret, tg)
    vox2 = jnp.transpose(vox.astype(BF16), (1, 2, 0, 3)).reshape(
        v * v, b * v)
    c = _s1_call(vox2, b, w, sph_res, rho_res, interpret)  # (Th, B, M, V)
    return jnp.swapaxes(c, 1, 2)


def _render_expd_fwd(vox, vox_res, sph_res, z_res, rho_res, interpret):
    assert vox.shape[1] == vox_res, (vox.shape, vox_res)
    b, v = vox.shape[0], vox_res
    w = _pallas_weights(vox_res, sph_res, z_res, rho_res)
    c = _s1_auto(vox, b, v, w, sph_res, z_res, rho_res, interpret)
    out_t = _s2scan_call(c, w, z_res, interpret)         # (Ph, Th, B)
    return jnp.transpose(out_t, (2, 0, 1)), vox


def _render_expd_bwd(vox_res, sph_res, z_res, rho_res, interpret, vox, g):
    from ..render_sph_fast import sample_rays_mxu
    from ..stop_prob import stop_probability

    def xla_render(v):
        prob = sample_rays_mxu(v, sph_res, z_res, rho_res,
                               compute_dtype=BF16)
        prob = jnp.clip(prob, 1e-5, 1.0 - 1e-5)
        stop = stop_probability(prob, axis=-1)
        depth_w = jnp.linspace(0.0, 1.0, z_res, dtype=prob.dtype)
        return (jnp.einsum("nrsz,z->nrs", stop, depth_w)
                + jnp.prod(1.0 - prob, axis=-1))

    _, vjp = jax.vjp(xla_render, vox)
    return (vjp(g)[0],)


render_expected_depth_pallas.defvjp(_render_expd_fwd, _render_expd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def sample_rays_pallas(vox, vox_res, sph_res=128, z_res=256, rho_res=192,
                       interpret=False):
    """(N, V, V, V) -> (N, R, R, Z) ray samples; fused Pallas kernels.

    ``vox_res`` must equal ``vox.shape[1]`` (passed separately so the
    VJP, which never sees ``vox``, stays shape-static).  Same contract
    as render_sph_fast.sample_rays_mxu (bf16 compute); parity pinned in
    tests/test_pallas_render.py.
    """
    return _sample_fwd(vox, vox_res, sph_res, z_res, rho_res, interpret)[0]


def _sample_fwd(vox, vox_res, sph_res, z_res, rho_res, interpret):
    assert vox.shape[1] == vox_res, (vox.shape, vox_res)
    b, v = vox.shape[0], vox_res
    w = _pallas_weights(vox_res, sph_res, z_res, rho_res)
    c = _s1_auto(vox, b, v, w, sph_res, z_res, rho_res,
                 interpret)                                  # (Th, M, B, V)
    out_t = _s2_call(c, w, z_res, interpret)                 # (Ph, Th, B, S)
    out = jnp.transpose(out_t, (2, 0, 1, 3))                 # (B, R, R, S)
    return out, None


def _sample_bwd(vox_res, sph_res, z_res, rho_res, interpret, _res, g):
    """Adjoint via XLA's transpose of the einsum formulation.

    The sampling map is linear, so its VJP needs no primals -- XLA
    dead-code-eliminates the forward pass below and keeps only the
    transposed contraction chain, which measures FASTER than custom
    adjoint kernels here (the reverse einsums' intermediates tile
    better under XLA than the fused accumulation grids)."""
    from ..render_sph_fast import sample_rays_mxu
    b = g.shape[0]
    zeros = jnp.zeros((b, vox_res, vox_res, vox_res), jnp.float32)
    _, vjp = jax.vjp(
        lambda v: sample_rays_mxu(v, sph_res, z_res, rho_res,
                                  compute_dtype=BF16), zeros)
    return (vjp(g.astype(jnp.float32))[0],)


sample_rays_pallas.defvjp(_sample_fwd, _sample_bwd)
