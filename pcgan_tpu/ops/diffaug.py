"""Differentiable augmentation for data-efficient GAN training
(``--diff_augment``, beyond-reference opt-in lever; off = parity).

Implements the DiffAugment recipe (Zhao et al., "Differentiable
Augmentation for Data-Efficient GAN Training", NeurIPS 2020): apply a
random differentiable transform T to EVERY image the discriminator sees —
T(real) and T(fake) in the D loss, T(fake) in the G loss — so D never
overfits the raw training set and G still receives gradients through T.
This is the standard lever for the small annotated datasets the PC-GAN
setting targets (paper-scale UTKFace subsets); the reconstruction (L1) and
comparator condition losses keep seeing RAW images — augmentation is an
adversarial-path regularizer, not a change to the generation target.

Policies (comma-separated, e.g. ``color,translation,cutout``):

  color        — per-sample brightness (+U(-.5,.5)), saturation
                 (channel-mean anchor, xU(0,2)) and contrast (pixel-mean
                 anchor, xU(.5,1.5)) jitter, in that order
  translation  — per-sample integer shift of up to 1/8 of the image size,
                 zero-padded (zero = mid-gray in [-1,1])
  cutout       — per-sample half-size square zeroed at a random position
                 (partial overlap with the border allowed)

TPU-first shapes: every transform is a branch-free per-sample map —
color is arithmetic, translation is one pad + a vmapped dynamic_slice,
cutout is a broadcasted comparison mask. No gathers, no data-dependent
shapes; everything fuses into the surrounding step under jit.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

POLICIES = ("color", "translation", "cutout")


def rand_color(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    b = x.shape[0]
    kb, ks, kc = jax.random.split(rng, 3)
    dt = x.dtype
    bright = (jax.random.uniform(kb, (b, 1, 1, 1), dt) - 0.5)
    sat = jax.random.uniform(ks, (b, 1, 1, 1), dt) * 2.0
    cont = jax.random.uniform(kc, (b, 1, 1, 1), dt) + 0.5
    x = x + bright
    c_mean = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - c_mean) * sat + c_mean
    p_mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3),
                      keepdims=True).astype(dt)
    return (x - p_mean) * cont + p_mean


def rand_translation(rng: jax.Array, x: jnp.ndarray,
                     ratio: float = 0.125) -> jnp.ndarray:
    b, h, w, c = x.shape
    s = max(1, int(h * ratio)), max(1, int(w * ratio))
    ky, kx = jax.random.split(rng)
    dy = jax.random.randint(ky, (b,), -s[0], s[0] + 1)
    dx = jax.random.randint(kx, (b,), -s[1], s[1] + 1)
    pad = jnp.pad(x, ((0, 0), (s[0], s[0]), (s[1], s[1]), (0, 0)))

    def shift(img, dy, dx):
        return jax.lax.dynamic_slice(img, (s[0] - dy, s[1] - dx, 0),
                                     (h, w, c))

    return jax.vmap(shift)(pad, dy, dx)


def rand_cutout(rng: jax.Array, x: jnp.ndarray,
                ratio: float = 0.5) -> jnp.ndarray:
    b, h, w, _ = x.shape
    ch, cw = max(1, int(h * ratio)), max(1, int(w * ratio))
    ky, kx = jax.random.split(rng)
    # top-left corner uniform over [-c/2, dim - c/2): the cut square can
    # hang off any border (the paper's partial-overlap semantics)
    oy = jax.random.randint(ky, (b, 1, 1), -(ch // 2), h - ch // 2)
    ox = jax.random.randint(kx, (b, 1, 1), -(cw // 2), w - cw // 2)
    iy = jnp.arange(h)[None, :, None]
    ix = jnp.arange(w)[None, None, :]
    cut = ((iy >= oy) & (iy < oy + ch)
           & (ix >= ox) & (ix < ox + cw))           # (b, h, w)
    return x * (1.0 - cut[..., None].astype(x.dtype))


_FNS = {"color": rand_color, "translation": rand_translation,
        "cutout": rand_cutout}


def parse_policy(policy: str) -> Sequence[str]:
    names = [p.strip() for p in policy.split(",") if p.strip()]
    bad = [p for p in names if p not in POLICIES]
    if bad:
        raise ValueError(f"--diff_augment: unknown policy {bad}; "
                         f"choose from {POLICIES}")
    return names


def make_diff_augment(policy: str) -> Callable:
    """``(rng, x) -> x`` applying the policy chain with independent
    per-sample draws; identity for an empty policy. Differentiable in x
    (draws depend only on rng), so G trains through it."""
    names = parse_policy(policy)
    if not names:
        return lambda rng, x: x

    def apply(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        for i, n in enumerate(names):
            x = _FNS[n](jax.random.fold_in(rng, i), x)
        return x

    return apply


def make_ada_augment(policy: str) -> Callable:
    """``(rng, x, p) -> x``: the ADA-gated policy chain (Karras et al.,
    "Training GANs with Limited Data", NeurIPS 2020). Each policy op fires
    INDEPENDENTLY per sample with probability ``p`` (a traced scalar the
    train step adapts from the discriminator-overfitting heuristic r_t);
    non-fired samples pass through untouched.

    Branch-free: every op is computed for the whole batch and blended in
    with a per-sample ``where`` mask — same FLOPs as the always-on chain,
    no data-dependent shapes, still differentiable in x (gates depend only
    on rng/p). ``p == 1`` reproduces :func:`make_diff_augment`'s output
    bit-for-bit for the same per-op keys; ``p == 0`` is the identity.
    Gate keys fold at offset 1000+i so they can never collide with the
    per-op draw keys (fold i)."""
    names = parse_policy(policy)
    if not names:
        raise ValueError("ADA needs a non-empty --diff_augment policy")

    def apply(rng: jax.Array, x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        for i, n in enumerate(names):
            y = _FNS[n](jax.random.fold_in(rng, i), x)
            u = jax.random.uniform(jax.random.fold_in(rng, 1000 + i),
                                   (b, 1, 1, 1), jnp.float32)
            x = jnp.where(u < p, y, x)
        return x

    return apply
