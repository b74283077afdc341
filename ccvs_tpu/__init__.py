"""CCVS-TPU: a TPU-native (JAX / XLA / Pallas / pjit) video-synthesis framework.

Re-implements the full capability surface of CCVS (Context-aware Controllable
Video Synthesis, NeurIPS 2021; reference implementation 16lemoing/ccvs) with a
TPU-first design:

- frame autoencoder with vector-quantized latents and learnable optical-flow
  context warping (`ccvs_tpu.nn.encoder` / `ccvs_tpu.nn.decoder`),
- autoregressive latent transformer with a fixed-shape KV cache
  (`ccvs_tpu.nn.gpt`), state / audio / class / point-to-point conditioning,
- adversarial training stack (StyleGAN2 image + 3D video discriminators, R1,
  ADA, EMA) (`ccvs_tpu.train`),
- SPMD data-parallel execution over a `jax.sharding.Mesh`
  (`ccvs_tpu.parallel`),
- Pallas TPU kernels for the hot ops (`ccvs_tpu.ops`).

All compute paths are jit-compiled, static-shaped, and designed around the
TPU memory hierarchy (MXU matmuls, fused VPU elementwise, HBM-resident
codebooks).
"""

__version__ = "0.1.0"
