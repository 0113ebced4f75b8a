"""Parity: fused Pallas renderer kernels vs the XLA einsum formulation.

sample_rays_pallas (ops/pallas/render_kernel.py) must match
sample_rays_mxu's bf16 path -- same math, fused in VMEM -- in both the
forward ray samples and the custom-VJP gradient.  Runs the kernels in
interpreter mode on CPU (the compiled path is exercised on the chip by
bench.py and tests/test_e2e_fullres.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from genre_shapehd_tpu.ops.render_sph_fast import (
    render_spherical_fast, sample_rays_mxu)
from genre_shapehd_tpu.ops.pallas.render_kernel import (
    render_expected_depth_pallas, sample_rays_pallas)

V, R, Z, M = 32, 32, 64, 64


def test_pallas_samples_match_xla_bf16():
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.random((2, V, V, V)), jnp.float32)
    ref = sample_rays_mxu(vox, R, Z, rho_res=M, compute_dtype=jnp.bfloat16)
    got = sample_rays_pallas(vox, V, R, Z, M, True)
    assert got.shape == ref.shape == (2, R, R, Z)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.mean() < 2e-3, d.mean()
    assert d.max() < 3e-2, d.max()


def test_pallas_vjp_matches_xla_grad():
    rng = np.random.default_rng(1)
    vox = jnp.asarray(rng.random((1, V, V, V)), jnp.float32)

    def loss_p(v):
        return jnp.sum(sample_rays_pallas(v, V, R, Z, M, True) ** 2)

    def loss_x(v):
        return jnp.sum(sample_rays_mxu(v, R, Z, rho_res=M,
                                       compute_dtype=jnp.bfloat16) ** 2)

    gp = np.asarray(jax.grad(loss_p)(vox))
    gx = np.asarray(jax.grad(loss_x)(vox))
    assert np.isfinite(gp).all()
    scale = np.abs(gx).max() + 1e-9
    assert np.abs(gp - gx).max() / scale < 2e-2


def test_render_spherical_fast_pallas_route():
    """End-to-end expected-depth map through the Pallas route matches the
    XLA route (same clip/stop-probability epilogue)."""
    rng = np.random.default_rng(2)
    vox = jnp.asarray(rng.random((1, V, V, V)), jnp.float32)
    ref = render_spherical_fast(vox, R, Z, rho_res=M,
                                compute_dtype=jnp.bfloat16,
                                use_pallas=False)
    # interpret-mode Pallas under the hood: call sample+epilogue manually
    from genre_shapehd_tpu.ops.stop_prob import stop_probability
    prob = sample_rays_pallas(vox, V, R, Z, M, True)
    prob = jnp.clip(prob, 1e-5, 1.0 - 1e-5)
    stop = stop_probability(prob, axis=-1)
    depth_w = jnp.linspace(0.0, 1.0, Z, dtype=prob.dtype)
    got = jnp.einsum("nrsz,z->nrs", stop, depth_w) + jnp.prod(
        1.0 - prob, axis=-1)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.mean() < 2e-3, d.mean()


def test_fused_expected_depth_matches_xla():
    """The fully fused kernel (stage 2 + stop-prob scan + depth reduction
    in VMEM) must match the XLA epilogue route."""
    rng = np.random.default_rng(3)
    # mix structure (a solid blob) with noise so the scan sees both
    # saturated and boundary probabilities
    vox = rng.random((2, V, V, V)).astype(np.float32) * 0.2
    c = (np.arange(V) + 0.5) / V - 0.5
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    vox += (x ** 2 + y ** 2 + z ** 2 < 0.09).astype(np.float32) * 0.9
    vox = jnp.asarray(np.clip(vox, 0.0, 1.0))
    ref = render_spherical_fast(vox, R, Z, rho_res=M,
                                compute_dtype=jnp.bfloat16,
                                use_pallas=False)
    got = render_expected_depth_pallas(vox, V, R, Z, M, True)
    assert got.shape == ref.shape == (2, R, R)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.mean() < 2e-3, d.mean()
    assert d.max() < 3e-2, d.max()


def test_fused_expected_depth_vjp_matches_xla():
    rng = np.random.default_rng(4)
    vox = jnp.asarray(rng.random((1, V, V, V)), jnp.float32)

    def loss_fused(v):
        return jnp.sum(render_expected_depth_pallas(v, V, R, Z, M, True)
                       ** 2)

    def loss_xla(v):
        return jnp.sum(render_spherical_fast(
            v, R, Z, rho_res=M, compute_dtype=jnp.bfloat16,
            use_pallas=False) ** 2)

    gf = np.asarray(jax.grad(loss_fused)(vox))
    gx = np.asarray(jax.grad(loss_xla)(vox))
    assert np.isfinite(gf).all()
    scale = np.abs(gx).max() + 1e-9
    assert np.abs(gf - gx).max() / scale < 2e-2
