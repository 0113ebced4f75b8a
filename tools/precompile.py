"""Warm the persistent XLA compile cache for the common configurations.

Full-model compiles over the axon relay take tens of minutes; running this
once after significant model changes makes every subsequent CLI / bench /
driver invocation start in seconds.  Compiles (in order of importance):

  1. full GenRe inference fwd, bf16, batch 4 (bench.py shapes)
  2. full GenRe inference fwd, f32, batch 1 (__graft_entry__.entry shapes)
  3. full GenRe train step, f32, batch 4 (scripts/train_full_genre.sh)

Usage: python tools/precompile.py [--batch 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.core.registry import get_model
    from genre_shapehd_tpu.models.base import default_opt

    enable_compile_cache()

    for dtype, batch, label in (("bfloat16", args.batch, "bench fwd"),
                                ("float32", 1, "entry fwd")):
        t0 = time.time()
        opt = default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                          padding_margin=16, dtype=dtype, batch_size=batch)
        model = get_model("genre_full_model")(opt)
        state = model.init_state(jax.random.PRNGKey(0))

        @jax.jit
        def fwd(params, bstats, rgb, silhou):
            out = model.net.apply(
                {"params": params, "batch_stats": bstats}, rgb, silhou,
                train=False)
            return out["pred_voxel"]

        rgb = jnp.zeros((batch, 256, 256, 3))
        sil = 100.0 * jnp.ones((batch, 256, 256, 1))
        jax.block_until_ready(fwd(state.params["net"],
                                  state.batch_stats["net"], rgb, sil))
        print(f"{label} ({dtype}, b{batch}): {time.time() - t0:.0f}s")

    if args.skip_train:
        return
    t0 = time.time()
    opt = default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                      padding_margin=16, batch_size=args.batch)
    model = get_model("genre_full_model")(opt)
    state = model.init_state(jax.random.PRNGKey(1))
    step = jax.jit(model.train_step, donate_argnums=(0,))
    batch = {
        "rgb": jnp.zeros((args.batch, 256, 256, 3)),
        "silhou": 100.0 * jnp.ones((args.batch, 256, 256, 1)),
        "voxel": jnp.zeros((args.batch, 128, 128, 128)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics["loss"])
    print(f"train step (f32, b{args.batch}): {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
