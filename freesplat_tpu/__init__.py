"""freesplat_tpu: a TPU-native (JAX/XLA/Pallas) generalizable 3D Gaussian
Splatting framework with the capabilities of wangys16/FreeSplat.

Subpackages:
- geometry: camera projection math (pure jnp)
- ops: compute kernels — Gaussian rasterizer (Pallas + jnp reference),
  plane-sweep cost volume, SH evaluation/rotation, grid sampling
- models: encoder (backbone, cost volume, depth decoder, PTF), decoder
- data: datasets, view samplers, shims
- training: losses, metrics, train loop, checkpointing
- parallel: device mesh + sharding rules
- utils: benchmarking, logging, export
"""

__version__ = "0.1.0"
