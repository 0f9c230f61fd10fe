"""Gradient-accumulated train step (``--grad_accum N``): batch_size
optimizer semantics at batch_size/N activation memory.

Beyond-reference HBM dial (SURVEY.md SS7 lists remat/spatial sharding as the
memory levers; this is the third, exact-math one): the jitted step splits
its batch into N equal microbatches, runs them through a sequential
``lax.scan`` (XLA reuses one microbatch's activation buffers across
iterations), and applies ONE optimizer update on the averaged gradients.
Because every per-sample loss here is a mean, the average of equal-size
microbatch gradients equals the full-batch gradient — so the result matches
``train.make_train_step`` on the same batch exactly (up to float
association; pinned by tests/test_accum.py).

Reference sequential semantics are preserved in two phases:

- phase A scans the microbatches for D gradients (the generator forward
  runs WITHOUT a gradient graph; the fake-image pool and any norm running
  stats thread through the scan carry), then D updates once;
- phase B re-scans with the SAME per-microbatch rng folds — identical
  fakes — linearizing G via ``jax.vjp`` against the UPDATED D, then G
  updates once. The G forward is recomputed rather than stashed: storing N
  linearizations would cost exactly the activation memory this mode exists
  to avoid (same trade as ``jax.checkpoint``).

The duplication of train.py's loss plumbing is deliberate and GUARDED: the
equivalence test fails if the two step builders drift.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pcgan_tpu.config import Config
from pcgan_tpu.data.binning import bin_to_onehot
from pcgan_tpu.models.comparator import condition_consistency_loss
from pcgan_tpu.ops.gan_loss import (feature_matching_loss, gan_loss,
                                    gradient_penalty, r1_penalty, split_pred)
from pcgan_tpu.train import TrainState, make_gan_optimizers
from pcgan_tpu.utils import image_pool


def make_accum_train_step(cfg: Config, G, D, C=None,
                          steps_per_epoch: int = 1,
                          mode: str = "sequential",
                          axis_name: Optional[str] = None) -> Callable:
    """Drop-in replacement for ``train.make_train_step`` when
    ``cfg.train.grad_accum > 1`` (same signature, same state, same
    metrics)."""
    accum = int(cfg.train.grad_accum)
    if accum < 2:
        raise ValueError("make_accum_train_step needs grad_accum >= 2; use "
                         "train.make_train_step otherwise")
    tx, tx_d = make_gan_optimizers(cfg, steps_per_epoch)
    t = cfg.train
    nb = cfg.data.n_age_bins
    use_cond_loss = (t.lambda_cond > 0.0) and (C is not None)
    score_mode = cfg.model.cond_mode == "score"
    compute_dtype = (jnp.bfloat16 if cfg.model.dtype == "bfloat16"
                     else jnp.float32)
    fuse_d = cfg.model.norm != "batch"

    def psum_mean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    def sample_conds(state, mbatch, bsz, r_target):
        """Per-microbatch condition sampling — mirrors train.py's block."""
        real_bin = mbatch["bin"].astype(jnp.int32)
        if score_mode:
            from pcgan_tpu.data.binning import (bin_to_score,
                                                denormalize_score,
                                                normalize_score)
            real = mbatch["image"].astype(compute_dtype)
            if "target_score" in mbatch:
                s_target = mbatch["target_score"].astype(jnp.float32)
            elif "target_bin" in mbatch:
                s_target = bin_to_score(mbatch["target_bin"], nb)
            else:
                s_target = jax.random.uniform(r_target, (bsz,),
                                              minval=-1.0, maxval=1.0)
            if C is not None:
                mu_r, _ = C.apply(state.c_vars, real, train=False)
                if os.environ.get("PCGAN_SG_REAL_SCORE"):
                    mu_r = jax.lax.stop_gradient(mu_r)
                if os.environ.get("PCGAN_BARRIER_SCORE"):
                    (mu_r,) = jax.lax.optimization_barrier((mu_r,))
                s_real = normalize_score(mu_r, state.score_min,
                                         state.score_max)
            else:
                s_real = bin_to_score(real_bin, nb)
            cond_real = s_real[:, None].astype(compute_dtype)
            cond_target = s_target[:, None].astype(compute_dtype)
            raw_target = denormalize_score(s_target, state.score_min,
                                           state.score_max)
            return cond_real, cond_target, raw_target, raw_target
        if "target_bin" in mbatch:
            target_bin = mbatch["target_bin"].astype(jnp.int32)
        else:
            target_bin = jax.random.randint(r_target, (bsz,), 0, nb)
        cond_real = bin_to_onehot(real_bin, nb, compute_dtype)
        cond_target = bin_to_onehot(target_bin, nb, compute_dtype)
        return (cond_real, cond_target,
                state.bin_lo[target_bin], state.bin_hi[target_bin])

    def d_apply(d_params, x, cond, base_state, d_state=None,
                return_features=False):
        d_state = base_state if d_state is None else d_state
        variables = {"params": d_params, **d_state}
        kw = {"return_features": True} if return_features else {}
        if d_state:
            logits, new_state = D.apply(variables, x, cond, train=True,
                                        mutable=list(d_state), **kw)
            return logits, new_state
        return D.apply(variables, x, cond, train=True, **kw), d_state

    def g_apply_2b(g_params, g_state, x2, c2, r_drop, with_vjp):
        """The fused 2B generator forward (fake + reconstruction), with or
        without a gradient graph."""
        def fwd(p):
            variables = {"params": p, **g_state}
            if g_state:
                out, new_state = G.apply(
                    variables, x2, c2, train=True,
                    rngs={"dropout": r_drop}, mutable=list(g_state))
            else:
                out = G.apply(variables, x2, c2, train=True,
                              rngs={"dropout": r_drop})
                new_state = g_state
            return out, new_state
        if with_vjp:
            out, vjp, new_state = jax.vjp(fwd, g_params, has_aux=True)
            return out, vjp, new_state
        out, new_state = fwd(jax.lax.stop_gradient(g_params))
        return out, None, new_state

    # --diff_augment: same wiring as the fused step (train.py) — D sees
    # T(real)/T(fake), G's adversarial term sees T(fake); empty policy
    # keeps the rng split count unchanged (off path bit-identical)
    from pcgan_tpu.ops.diffaug import make_diff_augment, parse_policy
    use_aug = bool(parse_policy(t.diff_augment))  # ',' / ' ' == off
    aug_always = make_diff_augment(t.diff_augment)
    # --ada_target: same wiring as the fused step (train.py) — per-sample
    # gated policy at probability state.aug_p, adapted in-device after the
    # D update from the microbatch-averaged r_t
    use_ada = t.ada_target > 0
    if use_ada:
        if not use_aug:
            raise ValueError("--ada_target needs a non-empty --diff_augment "
                             "policy to adapt (e.g. color,translation,cutout)")
        if t.gan_mode == "wgangp":
            # same rejection as the fused step (train.py): a critic's
            # output level is translation-invariant, r_t is undefined
            raise ValueError("--ada_target is undefined for --gan_mode "
                             "wgangp (the critic's output level is "
                             "translation-invariant, so the overfitting "
                             "heuristic r_t measures drift, not "
                             "overfitting); use lsgan/vanilla/hinge, or "
                             "plain --diff_augment without ADA")
        from pcgan_tpu.ops.diffaug import make_ada_augment
        ada_aug = make_ada_augment(t.diff_augment)
    use_vgg = t.lambda_vgg > 0   # same wiring as the fused step

    def mb_rngs(state, i):
        rng = jax.random.fold_in(state.rng, state.step)
        if axis_name:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng = jax.random.fold_in(rng, i)
        if use_aug:                # ... plus r_aug
            return jax.random.split(rng, 5)
        return (*jax.random.split(rng, 4),   # r_target, r_drop, r_pool, r_gp
                None)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        big = batch["image"].shape[0]
        if big % accum:
            raise ValueError(
                f"(per-device) batch {big} must be divisible by "
                f"--grad_accum {accum}")
        bsz = big // accum
        mbs = {k: v.reshape(accum, bsz, *v.shape[1:])
               for k, v in batch.items()}
        idx = jnp.arange(accum)
        aug = ((lambda r, x: ada_aug(r, x, state.aug_p)) if use_ada
               else aug_always)

        # ---- phase A: D gradients over the microbatch scan -----------------
        def phase_a(carry, xs):
            pool, d_gsum, g_state, d_state, sums = carry
            i, mbatch = xs
            r_target, r_drop, r_pool, r_gp, r_aug = mb_rngs(state, i)
            real = mbatch["image"].astype(compute_dtype)
            cond_real, cond_target, _, _ = sample_conds(
                state, mbatch, bsz, r_target)
            x2 = jnp.concatenate([real, real], axis=0)
            c2 = jnp.concatenate([cond_target, cond_real], axis=0)
            out, _, new_g_state = g_apply_2b(state.g_params, g_state,
                                             x2, c2, r_drop, with_vjp=False)
            fake_det = jax.lax.stop_gradient(out[:bsz])
            new_pool, fake_d, cond_fake_d = image_pool.query(
                pool, fake_det, cond_target, r_pool)

            def d_loss_fn(d_params):
                if fuse_d:
                    xx = jnp.concatenate(
                        [real, fake_d.astype(compute_dtype)], axis=0)
                    cc = jnp.concatenate(
                        [cond_real, cond_fake_d.astype(compute_dtype)],
                        axis=0)
                    if use_aug:
                        xx = aug(jax.random.fold_in(r_aug, 0), xx)
                    pred, ds2 = d_apply(d_params, xx, cc, d_state)
                    pred_real, pred_fake = split_pred(pred, bsz)
                    r1_real = xx[:bsz]
                else:
                    real_d, fake_dd = real, fake_d.astype(compute_dtype)
                    if use_aug:
                        real_d = aug(jax.random.fold_in(r_aug, 0), real_d)
                        fake_dd = aug(jax.random.fold_in(r_aug, 1), fake_dd)
                    pred_real, ds1 = d_apply(d_params, real_d, cond_real,
                                             d_state)
                    pred_fake, ds2 = d_apply(
                        d_params, fake_dd,
                        cond_fake_d.astype(compute_dtype), d_state,
                        d_state=ds1)
                    r1_real = real_d
                l_real = gan_loss(pred_real, True, t.gan_mode)
                l_fake = gan_loss(pred_fake, False, t.gan_mode)
                loss = 0.5 * (l_real + l_fake)
                if t.gan_mode == "wgangp":
                    gp_real, gp_fake = real, fake_det.astype(compute_dtype)
                    if use_aug:
                        gp_real = aug(jax.random.fold_in(r_aug, 2), gp_real)
                        gp_fake = aug(jax.random.fold_in(r_aug, 3), gp_fake)
                    gp = gradient_penalty(
                        lambda v, x, c: d_apply(v["params"], x, c,
                                                d_state)[0],
                        {"params": d_params}, gp_real, gp_fake,
                        cond_target, r_gp)
                    loss = l_real + l_fake + t.lambda_gp * gp
                if t.lambda_r1 > 0:
                    # --lambda_r1: same wiring as the fused step (train.py)
                    r1 = r1_penalty(
                        lambda v, x, c: d_apply(v["params"], x, c,
                                                d_state)[0],
                        {"params": d_params}, r1_real, cond_real)
                    loss = loss + (0.5 * t.lambda_r1) * r1
                else:
                    r1 = jnp.float32(0.0)
                from pcgan_tpu.ops.gan_loss import overfit_heuristic
                rt = (overfit_heuristic(jax.lax.stop_gradient(pred_real),
                                        t.gan_mode)
                      if use_ada else jnp.float32(0.0))
                return loss, (l_real, l_fake, r1, rt, ds2)

            (d_loss, (l_r, l_f, r1, rt, new_d_state)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params))
            d_gsum = jax.tree.map(jnp.add, d_gsum, d_grads)
            sums = (sums[0] + d_loss.astype(jnp.float32),
                    sums[1] + l_r.astype(jnp.float32),
                    sums[2] + l_f.astype(jnp.float32),
                    sums[3] + r1.astype(jnp.float32),
                    sums[4] + rt.astype(jnp.float32))
            return (new_pool, d_gsum, new_g_state, new_d_state, sums), None

        zeros_d = jax.tree.map(jnp.zeros_like, state.d_params)
        (new_pool, d_gsum, new_g_state, new_d_state, d_sums), _ = (
            jax.lax.scan(phase_a,
                         (state.pool, zeros_d, state.g_state, state.d_state,
                          (jnp.float32(0),) * 5),
                         (idx, mbs)))
        d_grads = psum_mean(jax.tree.map(lambda g: g / accum, d_gsum))
        d_upd, new_d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
        d_upd = jax.tree.map(lambda u: u * state.lr_scale, d_upd)
        new_d_params = optax.apply_updates(state.d_params, d_upd)

        if use_ada:
            # microbatch-mean r_t == the fused step's full-batch mean
            # (equal microbatch sizes); pmean'd so p moves in lockstep
            d_rt = psum_mean(d_sums[4] / jnp.float32(accum))
            n_dev = jax.lax.psum(1, axis_name) if axis_name else 1
            adj = (jnp.sign(d_rt - t.ada_target)
                   * (big * n_dev / (t.ada_kimg * 1000.0)))
            new_aug_p = jnp.clip(state.aug_p + adj, 0.0, 1.0)
        else:
            d_rt = jnp.float32(0.0)
            new_aug_p = state.aug_p

        # ---- phase B: G gradients vs the updated D -------------------------
        d_for_g = new_d_params if mode == "sequential" else state.d_params

        def phase_b(carry, xs):
            g_gsum, g_state, sums = carry
            i, mbatch = xs
            r_target, r_drop, _, _, r_aug = mb_rngs(state, i)  # SAME folds as A
            real = mbatch["image"].astype(compute_dtype)
            cond_real, cond_target, cond_lo, cond_hi = sample_conds(
                state, mbatch, bsz, r_target)
            x2 = jnp.concatenate([real, real], axis=0)
            c2 = jnp.concatenate([cond_target, cond_real], axis=0)
            out, g_vjp, new_g_state = g_apply_2b(
                state.g_params, g_state, x2, c2, r_drop, with_vjp=True)

            if t.lambda_feat > 0:
                # pix2pixHD feature matching — same fold-4 view as the fake
                # (see the fused-step comment in train.py)
                real_fm = (aug(jax.random.fold_in(r_aug, 4), real)
                           if use_aug else real)
                (_, real_feats), _ = d_apply(d_for_g, real_fm, cond_real,
                                             state.d_state,
                                             return_features=True)
                real_feats = jax.lax.stop_gradient(real_feats)

            def g_out_loss(out):
                fake, idt = out[:bsz], out[bsz:]
                fake_for_d = (aug(jax.random.fold_in(r_aug, 4), fake)
                              if use_aug else fake)
                if t.lambda_feat > 0:
                    (pred, fake_feats), _ = d_apply(
                        d_for_g, fake_for_d, cond_target, state.d_state,
                        return_features=True)
                    l_feat = feature_matching_loss(fake_feats, real_feats)
                else:
                    pred, _ = d_apply(d_for_g, fake_for_d, cond_target,
                                      state.d_state)
                    l_feat = jnp.float32(0.0)
                l_gan = gan_loss(pred, True, t.gan_mode,
                                 for_discriminator=False)
                l_l1 = jnp.mean(jnp.abs(idt.astype(jnp.float32)
                                        - real.astype(jnp.float32)))
                if use_cond_loss:
                    def apply_c(imgs):
                        return C.apply(state.c_vars, imgs, train=False)
                    if os.environ.get("PCGAN_REMAT_CMP"):
                        apply_c = jax.checkpoint(apply_c)
                    mu, log_var = apply_c(fake)
                    l_cond = condition_consistency_loss(mu, log_var,
                                                        cond_lo, cond_hi)
                else:
                    l_cond = jnp.float32(0.0)
                if use_vgg:
                    from pcgan_tpu.models.vgg import vgg_perceptual_loss
                    l_vgg = vgg_perceptual_loss(state.vgg_vars, idt, real)
                else:
                    l_vgg = jnp.float32(0.0)
                loss = (l_gan + t.lambda_L1 * l_l1 + t.lambda_cond * l_cond
                        + t.lambda_feat * l_feat + t.lambda_vgg * l_vgg)
                return loss, (l_gan, l_l1, l_cond, l_feat, l_vgg)

            (g_loss, (l_gan, l_l1, l_cond, l_feat, l_vgg)), dout = (
                jax.value_and_grad(g_out_loss, has_aux=True)(out))
            (g_grads,) = g_vjp(dout)
            g_gsum = jax.tree.map(jnp.add, g_gsum, g_grads)
            sums = (sums[0] + g_loss.astype(jnp.float32),
                    sums[1] + l_gan.astype(jnp.float32),
                    sums[2] + l_l1.astype(jnp.float32),
                    sums[3] + l_cond.astype(jnp.float32),
                    sums[4] + l_feat.astype(jnp.float32),
                    sums[5] + l_vgg.astype(jnp.float32))
            # thread the UPDATED norm state: phase B's microbatch i must see
            # the same mutable collections phase A's microbatch i saw, or
            # the recomputed fakes drift from the ones D trained against
            return (g_gsum, new_g_state, sums), None

        zeros_g = jax.tree.map(jnp.zeros_like, state.g_params)
        (g_gsum, _, g_sums), _ = jax.lax.scan(
            phase_b, (zeros_g, state.g_state, (jnp.float32(0),) * 6),
            (idx, mbs))
        g_grads = psum_mean(jax.tree.map(lambda g: g / accum, g_gsum))
        g_upd, new_g_opt = tx.update(g_grads, state.g_opt, state.g_params)
        g_upd = jax.tree.map(lambda u: u * state.lr_scale, g_upd)
        new_g_params = optax.apply_updates(state.g_params, g_upd)

        if t.ema_decay > 0 and state.ema_params is not None:
            step_f = state.step.astype(jnp.float32)
            d = jnp.minimum(jnp.float32(t.ema_decay),
                            (1.0 + step_f) / (10.0 + step_f))
            if t.skip_nonfinite > 0:
                # hold the EMA twin on skipped non-finite steps (see the
                # twin comment in train.py — d=1 makes the blend a no-op)
                d = jnp.where(new_g_opt.last_finite, d, jnp.float32(1.0))
            new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                   state.ema_params, new_g_params)
        else:
            new_ema = state.ema_params

        n = jnp.float32(accum)
        metrics = {
            "loss_G": g_sums[0] / n, "loss_G_GAN": g_sums[1] / n,
            "loss_G_L1": g_sums[2] / n, "loss_G_cond": g_sums[3] / n,
            "loss_D": d_sums[0] / n, "loss_D_real": d_sums[1] / n,
            "loss_D_fake": d_sums[2] / n,
        }
        if t.lambda_r1 > 0:
            metrics["loss_D_r1"] = d_sums[3] / n
        if t.lambda_feat > 0:
            metrics["loss_G_feat"] = g_sums[4] / n
        if use_vgg:
            metrics["loss_G_vgg"] = g_sums[5] / n
        if t.skip_nonfinite > 0:
            # cumulative skipped-update counts from the apply_if_finite
            # wrapper make_optimizer added (same lever as the fused step)
            metrics["notfinite_G"] = new_g_opt.total_notfinite.astype(
                jnp.float32)
            metrics["notfinite_D"] = new_d_opt.total_notfinite.astype(
                jnp.float32)
        metrics = {k: psum_mean(v) for k, v in metrics.items()}
        if use_ada:
            # already device-uniform (d_rt was pmean'd before the update) —
            # placed after the reduce like the fused step
            metrics["ada_p"] = new_aug_p
            metrics["ada_rt"] = d_rt
        if t.log_grad_norm:
            # the FULL accumulated-mean gradient trees (psum'd) — the same
            # quantity the fused step norms, so fused == accum holds here too
            metrics["grad_norm_G"] = optax.global_norm(g_grads).astype(
                jnp.float32)
            metrics["grad_norm_D"] = optax.global_norm(d_grads).astype(
                jnp.float32)
        if axis_name:
            new_g_state = jax.tree.map(psum_mean, new_g_state)
            new_d_state = jax.tree.map(psum_mean, new_d_state)
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_state=new_g_state, g_opt=new_g_opt,
            d_params=new_d_params, d_state=new_d_state, d_opt=new_d_opt,
            pool=new_pool, rng=state.rng, ema_params=new_ema,
            aug_p=new_aug_p)
        return new_state, metrics

    return train_step
