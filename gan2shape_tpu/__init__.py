"""gan2shape_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for unsupervised
2D-GAN-to-3D shape recovery, with the capabilities of the reference
alessioGalatolo/GAN-2D-to-3D (a GAN2Shape / arXiv:2011.00844 reproduction).

Design principles (TPU-first, not a port):
  * every hot path is a pure, jittable function over pytrees — no Python in the
    training loop (the reference dispatches one CUDA op at a time from Python);
  * the differentiable mesh rasterizer (the reference's external CUDA
    `neural_renderer`) is re-designed as a grid-mesh depth rasterizer:
    an XLA scatter-min winner pass + differentiable barycentric re-interpolation,
    with a Pallas z-buffer kernel on TPU;
  * StyleGAN2's CUDA ops (upfirdn2d / fused_bias_act) become fused XLA
    formulations (`lax.conv_general_dilated` with lhs dilation, fused VPU math);
  * scaling is expressed with `jax.sharding.Mesh` + jit shardings over an
    instance axis (the method's natural scaling axis), not NCCL.

Layout:
  ops/        numerics kernels: upfirdn2d, fused activation, grid_sample,
              resize, rasterizer (XLA + Pallas)
  models/     StyleGAN2 (frozen backbone), the 5 trainable nets, LPIPS
  rendering/  camera intrinsics, rigid warps, normals, the Renderer
  core/       the GAN2Shape method (3-step forwards), losses, priors, trainer,
              dataset, checkpointing
  parallel/   device-mesh construction and sharded training steps
  utils/      image resize/crop helpers, config system
  convert/    PyTorch checkpoint -> JAX pytree converters for frozen assets
"""

__version__ = "0.1.0"
