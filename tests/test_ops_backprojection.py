"""Parity + gradient tests for camera/spherical backprojection.

Oracle: a direct numpy transcription of the CUDA kernel semantics
(back_projection_kernel.cu:200-306 / 475-541), point by point.
"""

import numpy as np
import jax
import jax.numpy as jnp

from genre_shapehd_tpu.ops import (
    camera_backproject, shift_tdf, spherical_backproject, gen_sph_grid,
    backproject_spherical_masked, sph_pad,
)

RES = 32


def _cam_bp_oracle(depth, fl, cam_dist, res):
    """Scalar-loop transcription of the CUDA forward."""
    n, h, w = depth.shape
    vox = np.full((n, res, res, res), 1.0 / res, dtype=np.float64)
    acc = np.zeros((n, res, res, res))
    cnt = np.zeros((n, res, res, res))
    for b in range(n):
        for ih in range(h):
            for iw in range(w):
                d = depth[b, ih, iw]
                if d < 0:
                    continue
                imh = ih - (h - 1) / 2.0
                imw = iw - (w - 1) / 2.0
                ct = fl / np.sqrt(imh * imh + imw * imw + fl * fl)
                d = d * ct
                gy = -d * imw / fl
                gz = -d * imh / fl
                gx = d - cam_dist
                vi = [int(np.floor((g + 0.5) * res)) for g in (gx, gy, gz)]
                if any(v < 0 or v >= res for v in vi):
                    continue
                c = [(v + 0.5) / res - 0.5 for v in vi]
                dist = np.sqrt((gx - c[0]) ** 2 + (gy - c[1]) ** 2
                               + (gz - c[2]) ** 2)
                acc[b, vi[0], vi[1], vi[2]] += dist
                cnt[b, vi[0], vi[1], vi[2]] += 1
    hit = cnt > 1e-5
    vox[hit] = acc[hit] / cnt[hit]
    return vox, cnt


def test_camera_backproject_matches_oracle():
    rng = np.random.default_rng(0)
    h = w = 24
    depth = (2.2 + 0.3 * rng.standard_normal((2, h, w))).astype(np.float32)
    depth[0, :4, :4] = -1.0      # discarded pixels
    depth[1, :4, :4] = 0.0       # background -> out of cube
    fl, cam_dist = 35.0, 2.2
    want, _ = _cam_bp_oracle(depth.astype(np.float64), fl, cam_dist, RES)
    got = np.asarray(camera_backproject(jnp.asarray(depth), fl, cam_dist, RES))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_camera_backproject_background_value():
    depth = -np.ones((1, 8, 8), np.float32)   # everything discarded
    out = np.asarray(camera_backproject(jnp.asarray(depth), 10.0, 2.2, RES))
    np.testing.assert_allclose(out, 1.0 / RES)
    np.testing.assert_allclose(np.asarray(shift_tdf(out, RES)), 0.0)


def test_spherical_backproject_matches_oracle():
    rng = np.random.default_rng(1)
    r = 16
    sph = (0.4 + 0.1 * rng.standard_normal((2, r, r))).astype(np.float32)
    grid = gen_sph_grid(r)
    tdf, cnt = spherical_backproject(jnp.asarray(sph), res=RES)
    tdf, cnt = np.asarray(tdf), np.asarray(cnt)

    acc = np.zeros((2, RES, RES, RES))
    c = np.zeros((2, RES, RES, RES))
    for b in range(2):
        for i in range(r):
            for j in range(r):
                d = sph[b, i, j]
                if d < 0:
                    continue
                g = grid[i, j] * d
                vi = [int(np.floor((x + 0.5) * RES)) for x in g]
                if any(v < 0 or v >= RES for v in vi):
                    continue
                ctr = [(v + 0.5) / RES - 0.5 for v in vi]
                acc[b, vi[0], vi[1], vi[2]] += np.linalg.norm(g - np.array(ctr))
                c[b, vi[0], vi[1], vi[2]] += 1
    want = np.where(c > 1e-5, acc / np.maximum(c, 1), 0.0)
    np.testing.assert_allclose(tdf, want, atol=1e-4)
    np.testing.assert_allclose(cnt, c, atol=1e-6)


def test_camera_backproject_grad_matches_finite_differences():
    rng = np.random.default_rng(2)
    h = w = 8
    depth = (2.2 + 0.1 * rng.standard_normal((1, h, w))).astype(np.float64)
    fl, cam_dist, res = 12.0, 2.2, 8

    jax.config.update("jax_enable_x64", True)
    try:
        def loss(d):
            return jnp.sum(camera_backproject(d, fl, cam_dist, res) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(depth)))
        eps = 1e-6
        for (ih, iw) in [(2, 3), (4, 4), (6, 1)]:
            dp = depth.copy(); dp[0, ih, iw] += eps
            dm = depth.copy(); dm[0, ih, iw] -= eps
            fd = (float(loss(jnp.asarray(dp)))
                  - float(loss(jnp.asarray(dm)))) / (2 * eps)
            np.testing.assert_allclose(g[0, ih, iw], fd, rtol=2e-4, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_spherical_grad_flows_and_is_finite():
    rng = np.random.default_rng(3)
    sph = jnp.asarray(0.5 + 0.05 * rng.standard_normal((1, 48, 48)),
                      dtype=jnp.float32)
    full = sph_pad(sph[..., None], 8)[..., 0]

    def loss(s):
        return jnp.sum(backproject_spherical_masked(s, margin=8, res=RES))

    g = np.asarray(jax.grad(loss)(full))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
