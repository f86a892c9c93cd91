"""apnerf — a TPU-native (JAX/XLA/Pallas) articulated point-NeRF framework.

Re-implements the full capability surface of Articulated-Point-NeRF
(NeurIPS 2023, "Template-free Articulated Neural Point Clouds for Reposable
View Synthesis") with a TPU-first design:

* dense ``[rays, samples]`` ray-march layouts with validity masks instead of
  ragged CUDA compaction (reference ``lib/cuda/render_utils_kernel.cu``),
* XLA/Pallas kernels for grid interpolation, transmittance scans and KNN
  (reference: ``F.grid_sample``, ``alpha2weight`` CUDA kernel, pykeops),
* functional pytree models + optax-style masked-Adam optimizer
  (reference: ``lib/masked_adam.py`` fused CUDA Adam),
* ``jax.sharding`` data-parallel training over rays (reference: single GPU).
"""

__version__ = "0.1.0"
