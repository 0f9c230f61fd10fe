"""Training core: one jitted step holding BOTH alternating G/D updates.

Restructures the reference's ``model.optimize_parameters()`` (SURVEY.md SS4.1:
forward -> D backward+step -> G backward+step, two host dispatches + eager
autograd) into a single compiled ``train_step(state, batch) -> (state,
metrics)`` — one host->device dispatch per step, everything fused by XLA.

Key TPU-first design points:

- **One generator forward+backward per step** via ``jax.vjp``: the forward
  produces BOTH the target-conditioned fake and the self-conditioned
  reconstruction in one 2B-batched call (MXU-friendly); the same
  linearization is reused to pull G's gradients back after D has been
  updated — exact reference *sequential* semantics (G trains against the
  freshly-updated D) without a second forward. This is the fusion direction
  of FusedProp (arXiv:2004.03335), cited in SURVEY.md SS8.
- **Alternating semantics preserved**: D step uses the detached fake
  (pool-mixed, SURVEY.md SS2 C12), G step uses updated D params. A
  ``simultaneous`` mode (G sees pre-update D) is available as a static flag.
- **bf16 compute / f32 params+optimizer+losses** (SURVEY.md SS7 stability).
- Data parallelism composes from outside: the step contains no collectives;
  ``parallel/`` wraps it in shard_map with a gradient psum, or jit+sharding
  lets XLA insert them (SURVEY.md SS3.2).

Loss composition (SURVEY.md SS4.1):
  L_D = 0.5 * [gan(D(real, cond_real), 1) + gan(D(pool(fake), cond_fake), 0)]
        (+ lambda_gp * GP for wgangp)
  L_G = gan(D(fake, cond_target), 1)
        + lambda_L1  * |G(real, cond_real) - real|_1
        + lambda_cond * cond_consistency(comparator(fake), target-bin range)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pcgan_tpu.config import Config
from pcgan_tpu.data.binning import bin_to_onehot
from pcgan_tpu.models.comparator import condition_consistency_loss
from pcgan_tpu.ops.gan_loss import (feature_matching_loss, gan_loss,
                                    gradient_penalty, overfit_heuristic,
                                    r1_penalty, split_pred)
from pcgan_tpu.utils import image_pool


# --------------------------------------------------------------------------- #
# LR schedules (SURVEY.md SS2 C14: the reference's --lr_policy)
# --------------------------------------------------------------------------- #


def make_lr_schedule(cfg: Config, steps_per_epoch: int,
                     base_lr: Optional[float] = None) -> Callable:
    """Per-step schedule reproducing the reference's per-epoch policies.

    linear: flat for `niter` epochs then linear decay to 0 over `niter_decay`
    (reference lambda_rule: 1 - max(0, epoch+epoch_count-niter)/(niter_decay+1)).
    ``base_lr`` overrides the peak rate (the TTUR D optimizer, --lr_d);
    the decay SHAPE is shared either way.
    """
    t = cfg.train
    spe = max(1, steps_per_epoch)
    peak = t.lr if base_lr is None else base_lr

    def sched(step):
        epoch = step // spe + t.epoch_count  # 1-based like the reference
        if t.lr_policy == "linear":
            f = 1.0 - jnp.maximum(0.0, epoch - t.niter) / float(t.niter_decay + 1)
        elif t.lr_policy == "step":
            f = 0.1 ** (jnp.maximum(0, epoch - 1) // t.lr_decay_iters)
        elif t.lr_policy == "cosine":
            f = 0.5 * (1.0 + jnp.cos(jnp.pi * (epoch - 1) / float(t.niter)))
        elif t.lr_policy in ("constant", "plateau"):
            # plateau's metric-driven factor enters through the step-applied
            # lr_scale state scalar (PlateauScheduler below), not this
            # step-count schedule
            f = 1.0
        else:
            raise NotImplementedError(f"lr_policy [{t.lr_policy}]")
        return peak * jnp.clip(f, 0.0, 1.0)

    return sched


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (the reference's ``--lr_policy plateau``,
    SURVEY.md SS2 C14; torch ``lr_scheduler.ReduceLROnPlateau(mode='min',
    factor=0.2, threshold=0.01, patience=5)`` semantics).

    The jitted step cannot see host metrics, so the loop feeds the observed
    per-epoch loss here and writes the returned factor into
    ``TrainState.lr_scale`` — a replicated scalar the step multiplies into
    both optimizers' updates (exactly scaling Adam's lr).
    """

    def __init__(self, factor: float = 0.2, patience: int = 5,
                 threshold: float = 0.01, min_scale: float = 1e-4):
        self.factor, self.patience = factor, patience
        self.threshold, self.min_scale = threshold, min_scale
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        """Feed one epoch's metric (min mode); returns the current scale."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.bad_epochs = 0
        return self.scale


def make_optimizer(cfg: Config, steps_per_epoch: int,
                   base_lr: Optional[float] = None
                   ) -> optax.GradientTransformation:
    tx = optax.adam(make_lr_schedule(cfg, steps_per_epoch, base_lr),
                    b1=cfg.train.beta1, b2=cfg.train.beta2)
    if cfg.train.skip_nonfinite > 0:
        # bf16 GAN robustness lever (--skip_nonfinite, SURVEY.md SS6 failure
        # detection row): inf/nan grads -> zero update (params, Adam moments
        # and downstream EMA all hold); after N consecutive bad steps the
        # wrapper passes updates through so persistent divergence surfaces.
        # Applied here so the fused step, the grad-accum step and comparator
        # pretraining all inherit it.
        tx = optax.apply_if_finite(tx, cfg.train.skip_nonfinite)
    return tx


def make_gan_optimizers(cfg: Config, steps_per_epoch: int):
    """(tx_G, tx_D): D runs at ``--lr_d`` when set (TTUR, Heusel 2017 —
    beyond-reference opt-in; 0 = D shares --lr = parity). Same decay shape,
    same state TREE either way, so checkpoints stay cross-loadable."""
    tx_g = make_optimizer(cfg, steps_per_epoch)
    if cfg.train.lr_d > 0:
        return tx_g, make_optimizer(cfg, steps_per_epoch, cfg.train.lr_d)
    return tx_g, tx_g


# --------------------------------------------------------------------------- #
# train state
# --------------------------------------------------------------------------- #


@struct.dataclass
class TrainState:
    step: jnp.ndarray                   # scalar int32
    g_params: Any
    g_state: Any                        # non-param collections (batch_stats), maybe {}
    d_params: Any
    d_state: Any
    g_opt: Any
    d_opt: Any
    c_vars: Any                         # frozen comparator variables or None
    bin_lo: jnp.ndarray                 # (n_bins,) comparator score anchors
    bin_hi: jnp.ndarray
    score_min: jnp.ndarray              # scalar raw-score range for cond_mode=
    score_max: jnp.ndarray              # 'score' normalization (bin-mean extremes)
    lr_scale: jnp.ndarray               # host-driven LR factor (plateau policy)
    # plateau scheduler memory (SURVEY.md SS6 "resume is exact"): the host
    # feeds these back into PlateauScheduler on --continue_train so a run 4
    # bad-epochs into a 5-patience window stays 4 bad-epochs in after restart
    plateau_best: jnp.ndarray           # scalar f32, best metric so far
    plateau_bad: jnp.ndarray            # scalar f32, consecutive bad epochs
    pool: image_pool.PoolState
    rng: jax.Array
    ema_params: Any = None              # EMA twin of g_params (--ema_decay>0)
    # ADA augmentation probability (--ada_target>0, else None so the state
    # tree — and existing checkpoints — are untouched when the lever is off).
    # A replicated f32 scalar the step adapts in-device from the
    # D-overfitting heuristic; living here makes resume exact.
    aug_p: Any = None
    # frozen VGG19 trunk variables for --lambda_vgg (None = off, tree
    # untouched) — same lifecycle as c_vars: loaded once, never trained
    vgg_vars: Any = None


def _split_vars(variables) -> Tuple[Any, Any]:
    rest = dict(variables)
    params = rest.pop("params")
    return params, rest


def create_train_state(cfg: Config, G, D, rng: jax.Array,
                       steps_per_epoch: int,
                       c_vars: Any = None,
                       bin_anchors: Optional[Tuple] = None,
                       vgg_vars: Any = None) -> TrainState:
    """Initialize all params/optimizers/pool for the GAN (SURVEY.md SS4.4).

    ``bin_anchors`` is (lo, hi) or (lo, hi, bin_means) from
    ``compute_bin_anchors``; the bin means' extremes set the score-mode
    normalization range."""
    if cfg.train.lambda_vgg > 0 and vgg_vars is None:
        raise ValueError("--lambda_vgg > 0 needs VGG trunk variables: pass "
                         "--vgg_path <torchvision vgg19 .pth> (or 'random' "
                         "for a smoke run)")
    n, s = cfg.data.batch_size, cfg.data.crop_size
    nb = cfg.data.n_age_bins
    cond_nc = cfg.cond_nc
    x = jnp.zeros((n, s, s, cfg.data.input_nc), jnp.float32)
    cond = jnp.zeros((n, cond_nc), jnp.float32)
    rg, rd, rs = jax.random.split(rng, 3)
    g_params, g_state = _split_vars(
        G.init({"params": rg, "dropout": rg}, x, cond, train=True))
    d_params, d_state = _split_vars(
        D.init({"params": rd}, x, cond, train=True))
    tx, tx_d = make_gan_optimizers(cfg, steps_per_epoch)
    score_min, score_max = jnp.float32(-1.0), jnp.float32(1.0)
    if bin_anchors is None:
        # without comparator anchors the cond loss sees degenerate [0,0] bins;
        # it is disabled unless lambda_cond>0 AND c_vars provided.
        bin_lo = jnp.zeros((nb,), jnp.float32)
        bin_hi = jnp.zeros((nb,), jnp.float32)
    else:
        bin_lo, bin_hi = (jnp.asarray(bin_anchors[0], jnp.float32),
                          jnp.asarray(bin_anchors[1], jnp.float32))
        if len(bin_anchors) > 2 and bin_anchors[2] is not None:
            means = jnp.asarray(bin_anchors[2], jnp.float32)
            score_min, score_max = means[0], means[-1]
    return TrainState(
        step=jnp.array(0, jnp.int32),
        g_params=g_params, g_state=g_state,
        d_params=d_params, d_state=d_state,
        g_opt=tx.init(g_params), d_opt=tx_d.init(d_params),
        c_vars=c_vars, bin_lo=bin_lo, bin_hi=bin_hi,
        score_min=score_min, score_max=score_max,
        lr_scale=jnp.float32(1.0),
        plateau_best=jnp.float32(jnp.inf), plateau_bad=jnp.float32(0.0),
        pool=image_pool.init_pool(
            cfg.train.pool_size, (s, s, cfg.data.output_nc), cond_nc),
        rng=rs,
        # EMA twin starts at a COPY of the init params (aliased buffers would
        # be donated twice by the jitted step and crash Execute()); the
        # in-step decay ramp ((1+t)/(10+t)) debiases the init
        ema_params=(jax.tree.map(jnp.copy, g_params)
                    if cfg.train.ema_decay > 0 else None),
        # ADA starts un-augmented (p=0) and ramps up only if D overfits
        aug_p=(jnp.float32(0.0) if cfg.train.ada_target > 0 else None),
        vgg_vars=vgg_vars)


# --------------------------------------------------------------------------- #
# the step
# --------------------------------------------------------------------------- #


def make_train_step(cfg: Config, G, D, C=None, steps_per_epoch: int = 1,
                    mode: str = "sequential",
                    axis_name: Optional[str] = None) -> Callable:
    """Build the fused G/D step. `axis_name` != None adds an in-step gradient
    psum for use under shard_map/pmap (SURVEY.md SS3.2)."""
    tx, tx_d = make_gan_optimizers(cfg, steps_per_epoch)
    t = cfg.train
    nb = cfg.data.n_age_bins
    use_cond_loss = (t.lambda_cond > 0.0) and (C is not None)
    score_mode = cfg.model.cond_mode == "score"
    compute_dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    fuse_d = cfg.model.norm != "batch"   # 2B-batched D passes (see d_loss_fn)
    # --diff_augment (ops/diffaug.py): every image D sees goes through a
    # random differentiable transform — T(real)/T(fake) in the D loss,
    # T(fake) in the G loss; L1 and the comparator cond loss stay on RAW
    # images. Empty policy = identity AND an unchanged rng split, so the
    # off path is bit-identical to pre-lever builds (golden tests).
    from pcgan_tpu.ops.diffaug import make_diff_augment, parse_policy
    # parse, not truthiness: a whitespace/comma-only policy string must be
    # OFF (identity AND the unchanged 4-way rng split), not a silent
    # rng-stream change with no augmentation
    use_aug = bool(parse_policy(t.diff_augment))
    aug_always = make_diff_augment(t.diff_augment)
    # --ada_target (ops/diffaug.py make_ada_augment): the policy fires
    # per-sample with probability state.aug_p instead of always; the step
    # adapts p in-device from r_t (no host round-trip — TPU-first twin of
    # StyleGAN2-ADA's every-4-steps host update).
    use_ada = t.ada_target > 0
    if use_ada:
        if not use_aug:
            raise ValueError("--ada_target needs a non-empty --diff_augment "
                             "policy to adapt (e.g. color,translation,cutout)")
        if t.gan_mode == "wgangp":
            # the critic's output level is translation-invariant (only
            # E[D(real)]-E[D(fake)] is constrained), so sign(D(real)) pins
            # at +-1 from arbitrary drift — r_t would not measure
            # overfitting and p would ramp to 0 or 1 permanently
            raise ValueError("--ada_target is undefined for --gan_mode "
                             "wgangp (the critic's output level is "
                             "translation-invariant, so the overfitting "
                             "heuristic r_t measures drift, not "
                             "overfitting); use lsgan/vanilla/hinge, or "
                             "plain --diff_augment without ADA")
        from pcgan_tpu.ops.diffaug import make_ada_augment
        ada_aug = make_ada_augment(t.diff_augment)
    # --lambda_vgg (models/vgg.py): pix2pixHD perceptual loss between the
    # reconstruction and the real image; the trunk variables ride in
    # state.vgg_vars (frozen, c_vars lifecycle)
    use_vgg = t.lambda_vgg > 0

    def psum_mean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        real = batch["image"].astype(compute_dtype)        # (B,H,W,C) in [-1,1]
        bsz = real.shape[0]
        rng = jax.random.fold_in(state.rng, state.step)
        if axis_name:
            # per-device streams: target bins / dropout / pool traffic must
            # differ across the data axis (the pool buffer is axis-sharded)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        if use_aug:
            r_target, r_drop, r_pool, r_gp, r_aug = jax.random.split(rng, 5)
        else:
            r_target, r_drop, r_pool, r_gp = jax.random.split(rng, 4)
            r_aug = None
        # resolve the augmentation for THIS step: ADA closes over the
        # current probability scalar; plain DiffAugment is p-independent
        aug = ((lambda r, x: ada_aug(r, x, state.aug_p)) if use_ada
               else aug_always)

        real_bin = batch["bin"].astype(jnp.int32)
        if score_mode:
            # continuous comparator-score conditioning (the paper's score-map
            # variant, SURVEY.md SS2 C6/C11). Targets: uniform over the
            # normalized score range. Real condition: the frozen comparator's
            # own score of the real image when available (fully label-free —
            # no ages anywhere), else the normalized bin ladder.
            from pcgan_tpu.data.binning import (bin_to_score,
                                                denormalize_score,
                                                normalize_score)
            if "target_score" in batch:
                s_target = batch["target_score"].astype(jnp.float32)
            elif "target_bin" in batch:
                s_target = bin_to_score(batch["target_bin"], nb)
            else:
                s_target = jax.random.uniform(r_target, (bsz,),
                                              minval=-1.0, maxval=1.0)
            if C is not None:
                mu_r, _ = C.apply(state.c_vars, real, train=False)
                # the real-image scores need NO gradients (frozen C, constant
                # input); stop_gradient + an optimization barrier keep the
                # scoring subgraph out of the differentiated region AND out
                # of XLA's cross-boundary fusion/layout search (compile-time
                # knobs probed via tools/compile_probe.py)
                import os as _os
                if _os.environ.get("PCGAN_SG_REAL_SCORE"):
                    mu_r = jax.lax.stop_gradient(mu_r)
                if _os.environ.get("PCGAN_BARRIER_SCORE"):
                    (mu_r,) = jax.lax.optimization_barrier((mu_r,))
                s_real = normalize_score(mu_r, state.score_min,
                                         state.score_max)
            else:
                s_real = bin_to_score(real_bin, nb)
            cond_real = s_real[:, None].astype(compute_dtype)
            cond_target = s_target[:, None].astype(compute_dtype)
            # raw-score target for the comparator NLL cond loss
            raw_target = denormalize_score(s_target, state.score_min,
                                           state.score_max)
            cond_lo, cond_hi = raw_target, raw_target
            target_bin = None
        else:
            if "target_bin" in batch:
                target_bin = batch["target_bin"].astype(jnp.int32)
            else:
                target_bin = jax.random.randint(r_target, (bsz,), 0, nb)
            cond_real = bin_to_onehot(real_bin, nb, compute_dtype)
            cond_target = bin_to_onehot(target_bin, nb, compute_dtype)
            cond_lo, cond_hi = (state.bin_lo[target_bin],
                                state.bin_hi[target_bin])

        # ---- one 2B generator forward, linearized for later grad pullback --
        x2 = jnp.concatenate([real, real], axis=0)
        c2 = jnp.concatenate([cond_target, cond_real], axis=0)

        def g_forward(g_params):
            variables = {"params": g_params, **state.g_state}
            if state.g_state:
                out, new_state = G.apply(
                    variables, x2, c2, train=True,
                    rngs={"dropout": r_drop}, mutable=list(state.g_state))
            else:
                out = G.apply(variables, x2, c2, train=True,
                              rngs={"dropout": r_drop})
                new_state = state.g_state
            return out, new_state

        out, g_vjp, new_g_state = jax.vjp(g_forward, state.g_params,
                                          has_aux=True)
        fake = out[:bsz]          # G(real, target cond)
        idt = out[bsz:]           # G(real, own cond) — reconstruction target

        # ---- D update (detached fake, pool-mixed) --------------------------
        fake_det = jax.lax.stop_gradient(fake)
        new_pool, fake_d, cond_fake_d = image_pool.query(
            state.pool, fake_det, cond_target, r_pool)

        def d_apply(d_params, x, cond, d_state=None, return_features=False):
            d_state = state.d_state if d_state is None else d_state
            variables = {"params": d_params, **d_state}
            kw = {"return_features": True} if return_features else {}
            if d_state:
                logits, new_state = D.apply(variables, x, cond, train=True,
                                            mutable=list(d_state), **kw)
                return logits, new_state
            return D.apply(variables, x, cond, train=True, **kw), d_state

        def d_loss_fn(d_params):
            if fuse_d:
                # per-sample norms (instance/group/none): D(real) and D(fake)
                # batch into ONE 2B forward — identical math, better MXU
                # utilization (measured 12% faster D pass at batch 64)
                xx = jnp.concatenate(
                    [real, fake_d.astype(compute_dtype)], axis=0)
                cc = jnp.concatenate(
                    [cond_real, cond_fake_d.astype(compute_dtype)], axis=0)
                if use_aug:   # per-sample draws across the whole 2B batch
                    xx = aug(jax.random.fold_in(r_aug, 0), xx)
                pred, ds2 = d_apply(d_params, xx, cc)
                pred_real, pred_fake = split_pred(pred, bsz)
                r1_real = xx[:bsz]
            else:
                # batchnorm: keep the reference's sequential two-pass
                # semantics (per-pass batch stats; running stats chained)
                real_d, fake_dd = real, fake_d.astype(compute_dtype)
                if use_aug:
                    real_d = aug(jax.random.fold_in(r_aug, 0), real_d)
                    fake_dd = aug(jax.random.fold_in(r_aug, 1), fake_dd)
                pred_real, ds1 = d_apply(d_params, real_d, cond_real)
                pred_fake, ds2 = d_apply(
                    d_params, fake_dd,
                    cond_fake_d.astype(compute_dtype), d_state=ds1)
                r1_real = real_d
            l_real = gan_loss(pred_real, True, t.gan_mode)
            l_fake = gan_loss(pred_fake, False, t.gan_mode)
            loss = 0.5 * (l_real + l_fake)
            if t.gan_mode == "wgangp":
                # penalty interpolates real <-> CURRENT fake (reference
                # cal_gradient_penalty semantics); the pool mix feeds only
                # the l_fake critic term above (ADVICE r1: penalizing along
                # the stale pool manifold enforces Lipschitz off-policy)
                gp_real, gp_fake = real, fake_det.astype(compute_dtype)
                if use_aug:
                    # Lipschitz is enforced on the inputs D actually sees:
                    # augment BOTH endpoints, then interpolate
                    gp_real = aug(jax.random.fold_in(r_aug, 2), gp_real)
                    gp_fake = aug(jax.random.fold_in(r_aug, 3), gp_fake)
                gp = gradient_penalty(
                    lambda v, x, c: d_apply(v["params"], x, c)[0],
                    {"params": d_params}, gp_real, gp_fake, cond_target,
                    r_gp)
                loss = l_real + l_fake + t.lambda_gp * gp
            if t.lambda_r1 > 0:
                # --lambda_r1 (ops/gan_loss.py r1_penalty): zero-centered
                # penalty on the SAME real view D just scored (augmented
                # when DiffAugment is on). One extra D fwd+input-bwd on B
                # images — opt-in; the off path is untouched.
                r1 = r1_penalty(
                    lambda v, x, c: d_apply(v["params"], x, c)[0],
                    {"params": d_params}, r1_real, cond_real)
                loss = loss + (0.5 * t.lambda_r1) * r1
            else:
                r1 = jnp.float32(0.0)
            # ADA overfitting signal from the SAME (augmented) real view D
            # just scored; stop_gradient keeps it out of the D backward
            rt = (overfit_heuristic(jax.lax.stop_gradient(pred_real),
                                    t.gan_mode)
                  if use_ada else jnp.float32(0.0))
            return loss, (l_real, l_fake, r1, rt, ds2)

        (d_loss, (l_d_real, l_d_fake, l_d_r1, d_rt, new_d_state)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params))
        d_grads = psum_mean(d_grads)
        d_upd, new_d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
        # lr_scale: host-driven plateau factor; scaling Adam's update is
        # exactly scaling its lr (update = -lr * mhat/(sqrt(vhat)+eps))
        d_upd = jax.tree.map(lambda u: u * state.lr_scale, d_upd)
        new_d_params = optax.apply_updates(state.d_params, d_upd)

        if use_ada:
            # in-device ADA controller: nudge p toward keeping r_t at the
            # target — sign step of (global batch)/(ada_kimg*1000) per step,
            # i.e. p traverses [0,1] in ada_kimg thousand images. r_t is
            # pmean'd first so every device moves p in lockstep.
            d_rt = psum_mean(d_rt)
            n_dev = jax.lax.psum(1, axis_name) if axis_name else 1
            adj = (jnp.sign(d_rt - t.ada_target)
                   * (bsz * n_dev / (t.ada_kimg * 1000.0)))
            new_aug_p = jnp.clip(state.aug_p + adj, 0.0, 1.0)
        else:
            new_aug_p = state.aug_p

        # ---- G update (vs updated D in 'sequential' reference mode) --------
        d_for_g = new_d_params if mode == "sequential" else state.d_params

        if t.lambda_feat > 0:
            # pix2pixHD feature matching (--lambda_feat): D's intermediate
            # features on the real batch are the (constant) targets — one
            # extra B-sized D forward, no gradients. The real view gets the
            # SAME DiffAugment draw (fold 4) as the fake below, so FM
            # compares equivalently-transformed views per sample.
            real_fm = (aug(jax.random.fold_in(r_aug, 4), real)
                       if use_aug else real)
            (_, real_feats), _ = d_apply(d_for_g, real_fm, cond_real,
                                         return_features=True)
            real_feats = jax.lax.stop_gradient(real_feats)

        def g_out_loss(out):
            fake, idt = out[:bsz], out[bsz:]
            fake_for_d = (aug(jax.random.fold_in(r_aug, 4), fake)
                          if use_aug else fake)   # grads flow through T
            if t.lambda_feat > 0:
                (pred, fake_feats), _ = d_apply(
                    d_for_g, fake_for_d, cond_target, return_features=True)
                l_feat = feature_matching_loss(fake_feats, real_feats)
            else:
                pred, _ = d_apply(d_for_g, fake_for_d, cond_target)
                l_feat = jnp.float32(0.0)
            l_gan = gan_loss(pred, True, t.gan_mode, for_discriminator=False)
            l_l1 = jnp.mean(jnp.abs(idt.astype(jnp.float32)
                                    - real.astype(jnp.float32)))
            if use_cond_loss:
                import os as _os

                def apply_c(imgs):
                    return C.apply(state.c_vars, imgs, train=False)

                if _os.environ.get("PCGAN_REMAT_CMP"):
                    apply_c = jax.checkpoint(apply_c)
                mu, log_var = apply_c(fake)
                # onehot: NLL of the nearest in-bin score; score mode: the
                # interval degenerates to the exact raw target score, making
                # this the plain Gaussian NLL toward the conditioning score
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

        (g_loss, (l_g_gan, l_g_l1, l_g_cond, l_g_feat, l_g_vgg)), dout = (
            jax.value_and_grad(g_out_loss, has_aux=True)(out))
        (g_grads,) = g_vjp(dout)
        g_grads = psum_mean(g_grads)
        g_upd, new_g_opt = tx.update(g_grads, state.g_opt, state.g_params)
        g_upd = jax.tree.map(lambda u: u * state.lr_scale, g_upd)
        new_g_params = optax.apply_updates(state.g_params, g_upd)

        if t.ema_decay > 0 and state.ema_params is not None:
            # EMA of G params (quality lever beyond the reference; off by
            # default). Ramped decay min(d, (1+t)/(10+t)) debiases the init.
            step_f = state.step.astype(jnp.float32)
            d = jnp.minimum(jnp.float32(t.ema_decay),
                            (1.0 + step_f) / (10.0 + step_f))
            if t.skip_nonfinite > 0:
                # a skipped (non-finite) step must hold the EMA twin too:
                # new_g_params == g_params there, but the blend would still
                # pull the safe EMA snapshot toward the live params by (1-d)
                # per skipped step — exactly the drift the lever prevents
                d = jnp.where(new_g_opt.last_finite, d, jnp.float32(1.0))
            new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                   state.ema_params, new_g_params)
        else:
            new_ema = state.ema_params

        metrics = {
            "loss_G": g_loss, "loss_G_GAN": l_g_gan,
            "loss_G_L1": l_g_l1, "loss_G_cond": l_g_cond,
            "loss_D": d_loss, "loss_D_real": l_d_real, "loss_D_fake": l_d_fake,
        }
        if t.lambda_r1 > 0:
            metrics["loss_D_r1"] = l_d_r1
        if t.lambda_feat > 0:
            metrics["loss_G_feat"] = l_g_feat
        if use_vgg:
            metrics["loss_G_vgg"] = l_g_vgg
        if t.skip_nonfinite > 0:
            # cumulative skipped-update counts; grads are psum'd BEFORE the
            # wrapper sees them, so every device skips (or not) in lockstep
            metrics["notfinite_G"] = new_g_opt.total_notfinite
            metrics["notfinite_D"] = new_d_opt.total_notfinite
        metrics = {k: psum_mean(v.astype(jnp.float32))
                   for k, v in metrics.items()}
        if use_ada:
            # already device-uniform (d_rt was pmean'd before the update)
            metrics["ada_p"] = new_aug_p
            metrics["ada_rt"] = d_rt
        if t.log_grad_norm:
            # grads are already psum'd (device-uniform) — no extra
            # collective; two scalar tree-reductions on device
            metrics["grad_norm_G"] = optax.global_norm(g_grads).astype(
                jnp.float32)
            metrics["grad_norm_D"] = optax.global_norm(d_grads).astype(
                jnp.float32)
        if axis_name:
            # keep running stats (batchnorm) replicated across the data axis
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


# --------------------------------------------------------------------------- #
# comparator pretraining (SURVEY.md SS4.3)
# --------------------------------------------------------------------------- #


@struct.dataclass
class ComparatorState:
    step: jnp.ndarray
    params: Any
    state: Any
    opt: Any
    rng: jax.Array


def create_comparator_state(cfg: Config, C, rng: jax.Array,
                            steps_per_epoch: int = 1) -> ComparatorState:
    s = cfg.data.crop_size
    x = jnp.zeros((cfg.data.batch_size, s, s, cfg.data.input_nc), jnp.float32)
    params, cstate = _split_vars(C.init({"params": rng}, x, train=True))
    tx = make_optimizer(cfg, steps_per_epoch)
    return ComparatorState(step=jnp.array(0, jnp.int32), params=params,
                           state=cstate, opt=tx.init(params), rng=rng)


def make_comparator_step(cfg: Config, C, steps_per_epoch: int = 1,
                         axis_name: Optional[str] = None) -> Callable:
    """One pretraining step on pairwise batches
    {'image_a','image_b','label'(0: a older, 1: b older, 2: tie)}.

    Siamese trick: both pair members run through the trunk in ONE 2B-batched
    forward (single conv stack on the MXU)."""
    from pcgan_tpu.models.comparator import comparison_accuracy, comparison_loss
    tx = make_optimizer(cfg, steps_per_epoch)
    margin = cfg.model.tie_margin
    compute_dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    def step(state: ComparatorState, batch):
        a = batch["image_a"].astype(compute_dtype)
        b = batch["image_b"].astype(compute_dtype)
        label = batch["label"].astype(jnp.int32)
        bsz = a.shape[0]
        x2 = jnp.concatenate([a, b], axis=0)

        def loss_fn(params):
            variables = {"params": params, **state.state}
            if state.state:
                (mu, log_var), new_cs = C.apply(
                    variables, x2, train=True, mutable=list(state.state))
            else:
                mu, log_var = C.apply(variables, x2, train=True)
                new_cs = state.state
            loss = comparison_loss(mu[:bsz], log_var[:bsz], mu[bsz:],
                                   log_var[bsz:], label, margin)
            acc = comparison_accuracy(mu[:bsz], log_var[:bsz], mu[bsz:],
                                      log_var[bsz:], label, margin)
            return loss, (acc, new_cs)

        (loss, (acc, new_cs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = pmean(grads)
        upd, new_opt = tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, upd)
        metrics = {"loss_cmp": pmean(loss), "acc_cmp": pmean(acc)}
        return ComparatorState(state.step + 1, new_params, new_cs, new_opt,
                               state.rng), metrics

    return step


def compute_bin_anchors(C, c_vars, images: jnp.ndarray, bins: jnp.ndarray,
                        n_bins: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bin comparator score intervals from real data (SURVEY.md SS4.3:
    the frozen comparator 'sorts' data; bin anchors drive the GAN cond loss).

    Returns (lo, hi, means), each of shape (n_bins,): mean-score midpoints
    between adjacent bins, so each bin's interval tiles the score axis, plus
    the per-bin mean scores themselves (``means[0]``/``means[-1]`` define the
    score-mode conditioning range). Host-side (called once after
    pretraining). Empty bins — common at the age extremes of a small anchor
    subset — are filled by linear interpolation / edge-extension over bin
    index instead of a spurious 0 mean.
    """
    import numpy as np
    mu = np.asarray(C.apply(c_vars, images, train=False)[0], np.float64)
    b = np.asarray(bins)
    means = np.full(n_bins, np.nan)
    for k in range(n_bins):
        sel = b == k
        if sel.any():
            means[k] = mu[sel].mean()
    if np.isnan(means).all():
        raise ValueError("no anchor images fell into any bin")
    return _tile_anchor_intervals(means)


def _tile_anchor_intervals(means):
    """(n_bins,) per-bin mean scores (possibly with NaN gaps) -> (lo, hi,
    means): gap-filled, monotone means plus midpoint-tiled score intervals."""
    import numpy as np
    means = np.asarray(means, np.float64)
    n_bins = means.shape[0]
    idx = np.arange(n_bins, dtype=np.float64)
    ok = ~np.isnan(means)
    means = np.interp(idx, idx[ok], means[ok])   # fill gaps + extend edges
    # enforce monotonicity for degenerate comparators, then tile intervals
    means = np.sort(means)
    mid = 0.5 * (means[1:] + means[:-1])
    lo = np.concatenate([[-1e30], mid])
    hi = np.concatenate([mid, [1e30]])
    return (jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
            jnp.asarray(means, jnp.float32))


def compute_quantile_anchors(C, c_vars, images: jnp.ndarray, n_bins: int
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Score anchors with NO age labels (``--dataset_mode comparisons``):
    score the image pool with the frozen comparator, split into ``n_bins``
    equal-occupancy quantile groups along the score axis, and anchor each bin
    at its group's mean score. The label-free counterpart of
    ``compute_bin_anchors`` (SURVEY.md SS4.3: the comparator 'sorts' data).
    """
    import numpy as np
    mu = np.asarray(C.apply(c_vars, images, train=False)[0], np.float64)
    if mu.size == 0:
        raise ValueError("no images to fit score anchors on")
    groups = np.array_split(np.argsort(mu), n_bins)
    means = np.array([mu[g].mean() if len(g) else np.nan for g in groups])
    return _tile_anchor_intervals(means)
