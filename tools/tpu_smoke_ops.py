"""Drive the ops library end-to-end on the real TPU chip.

Chains the full GenRe geometry pipeline the way models will consume it:
depth image -> camera backprojection -> shift -> differentiable spherical
render -> pad -> crop+spherical backprojection -> masked df, then a Chamfer
score, all under one jit + grad on the default (axon TPU) platform.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from genre_shapehd_tpu import ops

print("devices:", jax.devices())

RES = 128
rng = np.random.default_rng(0)
depth = np.full((2, 256, 256), -1.0, np.float32)
depth[:, 64:192, 64:192] = 2.2 + 0.05 * rng.standard_normal((2, 128, 128))


def pipeline(depth):
    proj = ops.camera_backproject_shifted(depth, ops.FL_GENRE, ops.CAM_DIST, RES)
    sph = ops.render_spherical(jnp.clip(proj * 50.0, 1e-5, 1 - 1e-5),
                               sph_res=128, z_res=256)
    padded = ops.sph_pad(sph[..., None], 16)[..., 0]
    df = ops.backproject_spherical_masked(padded, margin=16, res=RES)
    return proj, sph, df


def loss_fn(depth):
    proj, sph, df = pipeline(depth)
    return jnp.mean(df ** 2) + jnp.mean(sph), (proj, sph, df)


grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

t0 = time.time()
(loss, (proj, sph, df)), g = grad_fn(jnp.asarray(depth))
jax.block_until_ready(g)
print(f"compile+run: {time.time() - t0:.1f}s")
t0 = time.time()
(loss, (proj, sph, df)), g = grad_fn(jnp.asarray(depth))
jax.block_until_ready(g)
print(f"steady-state step: {(time.time() - t0) * 1e3:.1f}ms")

print("loss:", float(loss))
print("proj range:", float(proj.min()), float(proj.max()),
      "finite:", bool(jnp.isfinite(proj).all()))
print("sph range:", float(sph.min()), float(sph.max()),
      "finite:", bool(jnp.isfinite(sph).all()))
print("df nonzero frac:", float((df != 0).mean()),
      "finite:", bool(jnp.isfinite(df).all()))
print("grad abs sum:", float(jnp.abs(g).sum()),
      "finite:", bool(jnp.isfinite(g).all()))

# probe: all-background depth must produce the documented invariants
bg = jnp.full((1, 256, 256), -1.0)
tdf_bg = ops.camera_backproject(bg, res=RES)
print("all-bg tdf == 1/res:", bool(jnp.allclose(tdf_bg, 1.0 / RES)))
sph_bg = ops.render_spherical(jnp.full((1, RES, RES, RES), 1e-5))
print("empty vox sph depth ~1:", float(sph_bg.mean()))

# probe: chamfer on TPU (MXU path, HIGHEST precision)
x1 = jnp.asarray(rng.standard_normal((4, 1024, 3)), dtype=jnp.float32)
x2 = jnp.asarray(rng.standard_normal((4, 2048, 3)), dtype=jnp.float32)
score = jax.jit(ops.nndistance_score)(x1, x2)
d_brute = ((np.asarray(x1)[:, :, None] - np.asarray(x2)[:, None]) ** 2).sum(-1)
want = (np.sqrt(d_brute.min(2)).mean(1) + np.sqrt(d_brute.min(1)).mean(1))
print("chamfer tpu vs cpu brute maxdiff:", float(np.abs(np.asarray(score) - want).max()))
print("OK")
