"""SUP-NeRF-TPU: a TPU-native (JAX/XLA/Pallas) framework for monocular 3D object
reconstruction in driving scenes.

Re-designed from scratch with the capabilities of the reference SUP-NeRF system
(ECCV 2024): joint 6-DoF pose estimation via an iterative projected-box refiner
and object-centric NeRF reconstruction conditioned on shape/texture latents,
trained on nuScenes and evaluated cross-domain on KITTI and Waymo.

Architecture (TPU-first, not a port):
  - geometry/   pure-jnp pose math, box corners, projections, rays, ROI ops
  - models/     flax.linen SUPNeRF / AutoRF / AutoRFMix / CodeNeRF
  - ops/        volume rendering (jnp oracle + fused Pallas TPU kernels)
  - render/     ray-level rendering APIs (pixel-sampled, full-image, virtual views)
  - tto/        batched, vmapped, jit-compiled test-time optimization
  - training/   pjit data-parallel trainers with per-instance code tables
  - parallel/   mesh / sharding helpers (ICI data-parallel)
  - data/       nuScenes / KITTI / Waymo datasets + synthetic fixtures
  - eval/       metric aggregation, plots, saved-result re-scoring
"""

__version__ = "0.1.0"
