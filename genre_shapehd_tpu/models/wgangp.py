"""3D-WGAN-GP shape prior on canonical-pose voxels.

TPU-native rebuild of /root/reference/models/wgangp.py.  The reference's
imperative two-optimizer loop (three separate .backward() calls, a
double-backward gradient penalty, G updated every ``gan_d_iter`` batches)
becomes ONE jitted train step:

  * D loss = mean D(fake) - mean D(real)
             + lambda * mean((||grad_x D(interp)||_2 - norm)^2)
    with the input-gradient taken by an inner jax.grad -- JAX composes the
    double backward that the reference needs create_graph=True for
    (wgangp.py:144-164).
  * G update is a ``lax.cond`` on step % gan_d_iter (wgangp.py:126-134),
    so the alternation lives inside the compiled program.

Metric names/signs mirror the reference logs: err_d_real = -mean D(real),
err_d_fake = mean D(fake), err_d = sum + gp, err_g = -mean D(G(z)) with
the last computed value carried in state.extra (wgangp.py:132-134).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn import VoxelDiscriminator, VoxelGenerator
from ..train.state import ModelState
from .base import ModelBase


class Model(ModelBase):
    requires = ["voxel_canon"]
    input_names = ["voxel_canon"]
    gt_names: list = []
    metrics = ["err_d_real", "err_d_fake", "err_d_gp", "err_d", "err_g",
               "loss"]
    nz = 200

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument("--canon_voxel", action="store_true",
                            help="Generate/discriminate canonical voxels")
        parser.add_argument("--wgangp_lambda", type=float, default=10.0,
                            help="gradient penalty coefficient")
        parser.add_argument("--wgangp_norm", type=float, default=1.0,
                            help="gradient penalty target norm")
        parser.add_argument("--gan_d_iter", type=int, default=1,
                            help="# D iterations per G iteration")
        return parser, set()

    def __init__(self, opt):
        super().__init__(opt)
        self.preprocess = None            # wgangp.py:62 -- raw voxels
        self.net_g = VoxelGenerator(nz=self.nz, nf=64, res=opt.vox_res,
                                    dtype=self.dtype)
        self.net_d = VoxelDiscriminator(nf=64, res=opt.vox_res,
                                        dtype=self.dtype)
        self.tx_g = self.adam()
        self.tx_d = self.adam()
        self.gp_lambda = float(getattr(opt, "wgangp_lambda", 10.0))
        self.gp_norm = float(getattr(opt, "wgangp_norm", 1.0))
        self.gan_d_iter = int(getattr(opt, "gan_d_iter", 1))

    @property
    def net_names(self):
        return ["net_g", "net_d"]

    @property
    def optimizer_names(self):
        return ["net_g", "net_d"]

    # ----------------------------------------------------------------- state
    def init_state(self, rng):
        rng_g, rng_d = jax.random.split(rng)
        z = jnp.zeros((1, self.nz))
        vox = jnp.zeros((1,) + (self.opt.vox_res,) * 3)
        gv = jax.jit(lambda r: self.net_g.init(r, z, train=False))(rng_g)
        dv = jax.jit(lambda r: self.net_d.init(r, vox))(rng_d)
        return ModelState(
            params={"net_g": gv["params"], "net_d": dv["params"]},
            batch_stats={"net_g": gv.get("batch_stats", {}),
                         "net_d": dv.get("batch_stats", {})},
            opt_state={"net_g": self.tx_g.init(gv["params"]),
                       "net_d": self.tx_d.init(dv["params"])},
            step=jnp.zeros((), jnp.int32),
            extra={"last_err_g": jnp.zeros(())},
        )

    # ----------------------------------------------------------------- step
    def _generate(self, g_params, g_stats, z):
        """G forward in train mode (BN batch stats update, matching the
        reference where G stays .train() even under no_grad)."""
        out, mut = self.net_g.apply(
            {"params": g_params, "batch_stats": g_stats}, z, train=True,
            mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def _d_apply(self, d_params, vox):
        return self.net_d.apply({"params": d_params}, vox)

    def train_step(self, state: ModelState, batch, rng):
        real = batch["voxel_canon"]
        b = real.shape[0]
        rng_z1, rng_alpha, rng_z2 = jax.random.split(rng, 3)

        # ---- D phase ----------------------------------------------------
        z1 = jax.random.normal(rng_z1, (b, self.nz))
        fake, g_stats_after_d = self._generate(
            state.params["net_g"], state.batch_stats["net_g"], z1)
        fake = jax.lax.stop_gradient(fake)
        alpha = jax.random.uniform(rng_alpha, (b, 1, 1, 1))

        def d_loss_fn(d_params):
            d_real = jnp.mean(self._d_apply(d_params, real))
            d_fake = jnp.mean(self._d_apply(d_params, fake))
            inter = alpha * real + (1.0 - alpha) * fake

            def d_sum(x):
                return jnp.sum(self._d_apply(d_params, x))

            grads_x = jax.grad(d_sum)(inter)
            gnorm = jnp.sqrt(
                jnp.sum(grads_x.reshape(b, -1) ** 2, axis=1) + 1e-16)
            gp = self.gp_lambda * jnp.mean((gnorm - self.gp_norm) ** 2)
            loss_d = d_fake - d_real + gp
            return loss_d, (d_real, d_fake, gp)

        (loss_d, (d_real, d_fake, gp)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params["net_d"])
        d_updates, d_opt = self.tx_d.update(
            d_grads, state.opt_state["net_d"], state.params["net_d"])
        d_params = optax.apply_updates(state.params["net_d"], d_updates)

        # ---- G phase (every gan_d_iter steps) ---------------------------
        z2 = jax.random.normal(rng_z2, (b, self.nz))

        def g_update(_):
            def g_loss_fn(g_params):
                gen, g_stats = self._generate(g_params, g_stats_after_d, z2)
                err_g = jnp.mean(self._d_apply(
                    jax.lax.stop_gradient(d_params), gen))
                return -err_g, (err_g, g_stats)

            (_, (err_g, g_stats)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params["net_g"])
            g_updates, g_opt = self.tx_g.update(
                g_grads, state.opt_state["net_g"], state.params["net_g"])
            g_params = optax.apply_updates(state.params["net_g"], g_updates)
            # reported metric is -mean D(gen) (wgangp.py:131); f32 so both
            # lax.cond branches match the f32 last_err_g carry under bf16
            return g_params, g_stats, g_opt, (-err_g).astype(jnp.float32)

        def g_skip(_):
            return (state.params["net_g"], g_stats_after_d,
                    state.opt_state["net_g"], state.extra["last_err_g"])

        g_params, g_stats, g_opt, err_g_metric = jax.lax.cond(
            state.step % self.gan_d_iter == 0, g_update, g_skip, None)

        new_state = state.replace(
            params={"net_g": g_params, "net_d": d_params},
            batch_stats={"net_g": g_stats,
                         "net_d": state.batch_stats["net_d"]},
            opt_state={"net_g": g_opt, "net_d": d_opt},
            step=state.step + 1,
            extra={"last_err_g": err_g_metric},
        )
        metrics = {
            "err_d_real": -d_real,
            "err_d_fake": d_fake,
            "err_d_gp": gp,
            "err_d": d_fake - d_real + gp,
            "err_g": err_g_metric,
            "loss": d_fake - d_real + gp,
        }
        return new_state, metrics

    def eval_step(self, state: ModelState, batch, rng):
        """-mean D(G(z)) as eval loss (wgangp.py:166-181)."""
        b = batch["voxel_canon"].shape[0]
        z = jax.random.normal(rng, (b, self.nz))
        gen, _ = self._generate(state.params["net_g"],
                                state.batch_stats["net_g"], z)
        disc = self._d_apply(state.params["net_d"], gen)
        return {"loss": -jnp.mean(disc)}, {"noise": z, "gen_voxel": gen,
                                           "disc": disc}

    def pack_output(self, pred, batch, add_gt: bool = True):
        return {k: np.asarray(v) for k, v in pred.items()}
