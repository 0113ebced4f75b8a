"""genre_shapehd_tpu — a TPU-native single-image 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
xiumingzhang/GenRe-ShapeHD (GenRe NeurIPS'18, ShapeHD ECCV'18, MarrNet
NeurIPS'17): RGB -> 2.5D sketches -> spherical inpainting -> 128^3 voxels,
plus the 3D-WGAN-GP shape prior, built TPU-first:

  * all geometry ops (camera/spherical backprojection, first-hit probability
    ray marching, differentiable spherical rendering, Chamfer distance) are
    pure-JAX / Pallas, differentiable end to end -- no CUDA, no host loops;
  * networks are Flax modules in NHWC / NDHWC layouts compiled by XLA;
  * data parallelism is a `jax.sharding.Mesh` + jit'd train steps, not
    scatter/gather device copies.

Layout:
  core/      config, registries, checkpointing
  ops/       differentiable geometry ops (+ pallas/ TPU kernels)
  nn/        Flax network zoo (resnet18, revresnet, uresnet, voxel nets, unet3d)
  models/    model interfaces: marrnet1/2, marrnet, wgangp, shapehd,
             depth_inpaint, genre_full
  data/      shapenet + glob test datasets, preprocessing, loaders
  parallel/  device mesh + sharding helpers
  train/     train loop, loggers, metrics, train state
  viz/       marching cubes -> obj, image dumps
  cli/       train/test entry points mirroring the reference flags
"""

__version__ = "0.1.0"
