"""tpu-vaegan: a TPU-native VAE-GAN framework (JAX / XLA / Pallas / pjit).

Re-implements the full capability surface of the Don-Yin/VAE-GAN reference
(Larsen et al., arXiv:1512.09300; reference notebook at /root/reference/gan.ipynb)
as an idiomatic TPU-first framework:

- ``vaegan_tpu.models``    — residual encoder/decoder, spatial VAE code processor,
  spectral-normalized critic (reference README.md:118-295, 349-500, 521-669).
- ``vaegan_tpu.ops``       — TPU compute primitives: conv/conv-transpose lowered for the
  MXU, functional BatchNorm with cross-replica stats, spectral norm power iteration,
  Pallas fused kernels.
- ``vaegan_tpu.losses``    — WGAN-GP, BCE adversarial, pixel L1+MSE, Dis_l feature
  matching, KL (reference README.md:689-857).
- ``vaegan_tpu.train``     — jitted train steps (two- and three-optimizer), torch-exact
  RMSprop, training loop, checkpointing.
- ``vaegan_tpu.data``      — host-side NIfTI pipeline (C++ decoder + nibabel fallback)
  feeding HBM-resident sharded batches (reference README.md:50-106).
- ``vaegan_tpu.parallel``  — device mesh + sharding rules (data parallel over ICI).
- ``vaegan_tpu.inference`` — reconstruct / sample / interpolate APIs
  (reference README.md:1215-1256 + the generation path the reference lacks).
"""

__version__ = "0.1.0"

from vaegan_tpu import config as config  # noqa: F401
