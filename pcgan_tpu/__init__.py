"""pcgan_tpu — a TPU-native (JAX/XLA/Pallas) conditional-GAN face-aging framework.

Rebuilds the capabilities of the reference `phymhan/pc-gan` (AAAI-2020,
arXiv:1911.09298: "Robust Conditional GAN from Uncertainty-Aware Pairwise
Comparisons") as an idiomatic TPU-first design:

- Flax conditional encoder-decoder generator + PatchGAN discriminator
  (SURVEY.md SS2 C6/C7), NHWC, bf16 compute / f32 params.
- A Siamese comparator with a Thurstone pairwise-ranking likelihood
  (SURVEY.md SS2 C8) usable both as a pretrained condition-consistency loss
  and as a sorter of unlabeled data into condition bins.
- One jitted `train_step` holding BOTH alternating G/D optimizer updates
  (SURVEY.md SS4.1 restructuring note), data-parallel over a
  `jax.sharding.Mesh` with XLA collectives over ICI.
- A Pallas-fused on-device input pipeline (crop/flip/normalize; separable
  matmul resize on the MXU) replacing the reference's CPU decode loop.
- Orbax checkpointing, a `.pth` generator-weight importer for output parity,
  an aging-progression sampler and streaming on-device FID.

Provenance note: the reference mount was EMPTY in this environment
(SURVEY.md SS0); behavior targets come from BASELINE.json and the published
paper, not from reference source lines.
"""

__version__ = "0.1.0"
