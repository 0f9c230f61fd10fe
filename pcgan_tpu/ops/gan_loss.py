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


def split_pred(pred, bsz: int):
    """Split a 2B-batched D output into (first-B, second-B) halves —
    per-scale for the multiscale discriminator's tuple of patch maps."""
    if isinstance(pred, (tuple, list)):
        return (tuple(p[:bsz] for p in pred), tuple(p[bsz:] for p in pred))
    return pred[:bsz], pred[bsz:]


def _sum_logits(out) -> jnp.ndarray:
    """Total sum of D logits across all scales (torch grad_outputs=ones
    semantics for the penalty double-backwards)."""
    if isinstance(out, (tuple, list)):
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)
    return jnp.sum(out.astype(jnp.float32))


def gan_loss(logits: jnp.ndarray, target_is_real: bool, mode: str = "lsgan",
             for_discriminator: bool = True) -> jnp.ndarray:
    """Loss for one batch of D outputs, matching reference GANLoss semantics.

    A tuple/list of patch maps (``--netD multiscale``) averages the
    per-scale criteria, keeping the loss magnitude comparable to a single
    D so the --lambda_* weights transfer unchanged."""
    if isinstance(logits, (tuple, list)):
        per = [gan_loss(l, target_is_real, mode, for_discriminator)
               for l in logits]
        return sum(per) / len(per)
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


def overfit_heuristic(pred_real, mode: str = "lsgan") -> jnp.ndarray:
    """ADA discriminator-overfitting heuristic r_t (Karras et al. 2020,
    "Training GANs with Limited Data", eq. for ``rv``):
    ``r_t = E[sign(D(real) - mid)]`` over the real-batch patch logits —
    +1 when D confidently separates every real patch (overfitting), ~0 at
    equilibrium. ``mid`` is the mode's decision midpoint: 0.5 for lsgan
    (D regresses real->1 / fake->0), 0 for the logit-output modes
    (vanilla/hinge). NOT meaningful for wgangp — a critic's output level
    is translation-invariant, so sign(D(real)) measures arbitrary drift;
    the step builders reject that combination. The multiscale tuple
    averages per-scale means (the gan_loss convention), keeping r_t's
    scale invariant to --num_D."""
    if isinstance(pred_real, (tuple, list)):
        per = [overfit_heuristic(p, mode) for p in pred_real]
        return sum(per) / len(per)
    mid = 0.5 if mode == "lsgan" else 0.0
    return jnp.mean(jnp.sign(pred_real.astype(jnp.float32) - mid))


def feature_matching_loss(fake_feats, real_feats) -> jnp.ndarray:
    """pix2pixHD feature-matching loss (Wang et al. 2018 eq. 4) for
    ``--lambda_feat``: L1 between the discriminator's intermediate features
    on fake vs real, gradients flowing to G only (callers stop_gradient the
    real side).

    Accepts one D's feature list (tuple of maps) or the multiscale tuple of
    such lists. Weights mirror pix2pixHD's: each scale contributes
    ``4/(n_feat) * mean(|f_fake - f_real|)`` per layer, averaged over scales
    — so the magnitude is comparable across --num_D/--n_layers_D choices
    and the published lambda_feat=10 transfers."""
    if fake_feats and isinstance(fake_feats[0], (tuple, list)):
        per = [feature_matching_loss(f, r)
               for f, r in zip(fake_feats, real_feats)]
        return sum(per) / len(per)
    w = 4.0 / max(len(fake_feats), 1)
    total = jnp.float32(0.0)
    for f, r in zip(fake_feats, real_feats):
        total += w * jnp.mean(jnp.abs(f.astype(jnp.float32)
                                      - r.astype(jnp.float32)))
    return total


def gradient_penalty(d_apply, variables, real: jnp.ndarray, fake: jnp.ndarray,
                     cond: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """WGAN-GP penalty on random interpolates (reference ``cal_gradient_penalty``
    semantics, 'mixed' type). d_apply(variables, x, cond) -> logits."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), dtype=jnp.float32)
    inter = eps * real.astype(jnp.float32) + (1.0 - eps) * fake.astype(jnp.float32)

    def d_sum(x):
        return _sum_logits(d_apply(variables, x, cond))

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
        return _sum_logits(d_apply(variables, x, cond))

    grads = jax.grad(d_sum)(real.astype(jnp.float32))
    return jnp.mean(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
