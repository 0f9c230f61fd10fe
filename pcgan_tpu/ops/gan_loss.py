"""Adversarial criteria (SURVEY.md SS2 C9: the reference's ``GANLoss``).

Modes mirror the reference's ``--gan_mode``: ``vanilla`` (sigmoid BCE on
logits), ``lsgan`` (MSE vs 0/1 targets — the bf16-friendly default, SURVEY.md
SS7 stability note), ``wgangp`` (Wasserstein + gradient penalty helper), plus
``hinge``. Discriminators emit raw patch logits; target tensors are
broadcast, never materialized host-side. All losses reduce in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    # numerically stable BCE-with-logits vs constant target
    return jnp.mean(jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))


def gan_loss(logits: jnp.ndarray, target_is_real: bool, mode: str = "lsgan",
             for_discriminator: bool = True) -> jnp.ndarray:
    """Loss for one batch of D outputs, matching reference GANLoss semantics."""
    x = logits.astype(jnp.float32)
    if mode == "vanilla":
        return _bce_logits(x, 1.0 if target_is_real else 0.0)
    if mode == "lsgan":
        t = 1.0 if target_is_real else 0.0
        return jnp.mean((x - t) ** 2)
    if mode == "wgangp":
        return -jnp.mean(x) if target_is_real else jnp.mean(x)
    if mode == "hinge":
        if for_discriminator:
            return (jnp.mean(jax.nn.relu(1.0 - x)) if target_is_real
                    else jnp.mean(jax.nn.relu(1.0 + x)))
        return -jnp.mean(x)
    raise NotImplementedError(f"gan_mode [{mode}] not implemented")


def gradient_penalty(d_apply, variables, real: jnp.ndarray, fake: jnp.ndarray,
                     cond: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """WGAN-GP penalty on random interpolates (reference ``cal_gradient_penalty``
    semantics, 'mixed' type). d_apply(variables, x, cond) -> logits."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), dtype=jnp.float32)
    inter = eps * real.astype(jnp.float32) + (1.0 - eps) * fake.astype(jnp.float32)

    def d_sum(x):
        return jnp.sum(d_apply(variables, x, cond).astype(jnp.float32))

    grads = jax.grad(d_sum)(inter)
    gnorm = jnp.sqrt(jnp.sum(grads.astype(jnp.float32) ** 2,
                             axis=(1, 2, 3)) + 1e-16)
    return jnp.mean((gnorm - 1.0) ** 2)


def r1_penalty(d_apply, variables, real: jnp.ndarray,
               cond: jnp.ndarray) -> jnp.ndarray:
    """R1 gradient penalty (Mescheder et al. 2018, "Which Training Methods
    for GANs do actually Converge?"): ``E[||grad_x D(x)||^2]`` on REAL
    images only — the zero-centered regularizer behind StyleGAN-family
    stability. Beyond-reference opt-in (``--lambda_r1``, SURVEY.md SS2 C9
    lists only the reference's vanilla/lsgan/wgangp criteria); the caller
    scales by ``lambda_r1 / 2`` (the conventional gamma/2 weighting).

    ``d_apply(variables, x, cond) -> logits``; logits sum over the batch so
    one ``jax.grad`` yields per-sample input gradients (D is per-sample, the
    sum decomposes) — the same double-backward structure as
    ``gradient_penalty`` above, which compiles cleanly on this toolchain
    (the custom-VJP wgrad trap in docs/perf_notes.md does not apply to
    input gradients).
    """
    def d_sum(x):
        return jnp.sum(d_apply(variables, x, cond).astype(jnp.float32))

    grads = jax.grad(d_sum)(real.astype(jnp.float32))
    return jnp.mean(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
