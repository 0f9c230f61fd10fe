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

__version__ = "0.3.0"

# Lazy re-exports of the public library surface (PEP 562) — keeps
# `import pcgan_tpu` light (no jax/flax import) while letting library users
# write `from pcgan_tpu import parse_config, define_G, ...`.
_EXPORTS = {
    "Config": ("pcgan_tpu.config", "Config"),
    "parse_config": ("pcgan_tpu.config", "parse_config"),
    "define_G": ("pcgan_tpu.models.registry", "define_G"),
    "define_D": ("pcgan_tpu.models.registry", "define_D"),
    "define_C": ("pcgan_tpu.models.registry", "define_C"),
    "init_params": ("pcgan_tpu.models.registry", "init_params"),
    "create_train_state": ("pcgan_tpu.train", "create_train_state"),
    "make_train_step": ("pcgan_tpu.train", "make_train_step"),
    "export_generator": ("pcgan_tpu.serving", "export_generator"),
    "load_exported": ("pcgan_tpu.serving", "load_exported"),
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        mod, attr = _EXPORTS[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'pcgan_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
