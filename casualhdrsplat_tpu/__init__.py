"""casualhdrsplat_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of WU-CVGL/CasualHDRSplat.

Re-designed from scratch for TPU hardware rather than translated from the
reference CUDA/torch lineage (see /root/reference/Readme.md:54 for the
capability contract):

- 3D Gaussian Splatting storing an HDR radiance field (G_theta),
- a unified physical image-formation model: SE(3)-spline camera motion,
  learnable per-frame exposure times, a shared learnable camera response
  function (CRF), and motion blur synthesized by averaging virtual sharp
  renders,
- joint optimization of scene, trajectory, exposure, and CRF,
- novel-view LDR/HDR synthesis, HDR exposure editing, and deblurring.

Compute path: jnp + Pallas TPU kernels under jax.custom_vjp.
Scaling path: jax.sharding.Mesh + shard_map with XLA collectives.
"""

__version__ = "0.1.0"

from casualhdrsplat_tpu import config  # noqa: F401
