"""Typed configuration + reference-compatible CLI (SURVEY.md SS2 C3, SS6 config row).

The reference uses layered argparse options (``options/base_options.py`` +
train/test variants, pix2pix-template style). Here the single source of truth
is a frozen dataclass tree; the CLI layer exposes the reference's public flag
names (``--dataroot --name --model --load_size --crop_size --batch_size
--niter --lr --lambda_L1 --epoch ...``) plus TPU-native additions
(mesh shape, bf16 policy, pallas pipeline toggles).

Everything that reaches a jitted function is static and hashable.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


# --------------------------------------------------------------------------- #
# dataclasses
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class DataConfig:
    """Input-pipeline config (reference L5, SURVEY.md SS2 C10/C11)."""

    dataroot: str = "./datasets/utkface"
    dataset_mode: str = "aging"      # aging|pairwise|single|synthetic|sorted|
                                     # comparisons|packed (pre-decoded mmap)
    load_size: int = 143             # resize shorter side to this ...
    crop_size: int = 128             # ... then (random|center) crop to this
    preprocess: str = "resize_and_crop"  # resize_and_crop|crop|resize|none
    no_flip: bool = False
    serial_batches: bool = False
    num_threads: int = 4             # host-side decode workers
    # host decode scale M/8 (8 = full-scale, bit-parity with the reference
    # transform chain). M<8 decodes JPEGs at M/8 size in the DCT domain
    # (libjpeg scale_num) — a documented NON-PARITY fast path for
    # core-starved hosts; the device pipeline then resizes from the smaller
    # canvas. Requires load_size <= ceil(native*M/8).
    host_decode_m: int = 8
    # PIL-resize to load_size on the HOST before transfer (the reference's
    # own CPU transform) instead of on device — ~2x fewer host->device
    # bytes; wins when the link is the bottleneck (measured on the tunneled
    # PJRT: 411 -> 464 imgs/s e2e @128px). Off by default: the device
    # resize is the TPU-native path and direct-attached hosts are never
    # transfer-bound. Parity-faithful either way (device matrices reproduce
    # PIL; host path IS PIL).
    host_resize: bool = False
    # the fixed square canvas (px) folder datasets decode to on the host —
    # fixed-shape batches are what keeps host->device transfer and the jitted
    # step static-shaped. 0 (default) = auto-detect from the first image in
    # the folder (UTKFace aligned -> 200, CACD -> 250: uniform-size sources
    # then take the decode-only path with NO host resample, exactly the
    # reference's transform chain). Explicit >0 pins it (mixed-size folders).
    native_size: int = 0
    max_dataset_size: int = -1       # -1 == unlimited (ref uses float('inf'))
    # seeded held-out row fraction (VERDICT r3 item 3): training uses
    # (1-frac) of the dataset; in-training eval and evaluate.py report
    # metrics against BOTH splits (eval_* vs eval_h_*), so generalization
    # is measured instead of memorization. 0 = off = reference parity
    # (eval reals come from the training pool, as the template family does).
    holdout_frac: float = 0.0
    labels_csv: str = ""             # for dataset_mode=sorted (comparator bins)
    comparisons_csv: str = ""        # for dataset_mode=comparisons (pathA,pathB,label)
    batch_size: int = 8              # GLOBAL batch (split across data mesh axis)
    input_nc: int = 3
    output_nc: int = 3
    n_age_bins: int = 10             # condition cardinality (C11)
    max_age: int = 116               # UTKFace age range upper bound
    pallas_pipeline: bool = True     # fused on-device crop/flip/normalize
    prefetch: int = 2                # device-prefetch depth
    # upload the WHOLE dataset to HBM once (u8 canvases, replicated over the
    # mesh) and gather batches on device — per-step host->device traffic
    # drops to the batch indices (~bytes). Beyond-reference perf lever for
    # datasets that fit HBM (UTKFace@200px ~= 2.3 GiB / 20k images); the
    # sample stream is bit-identical to the host Loader (pinned by test).
    # Single-process only; 0 = off = stream from the host (parity default).
    device_cache: bool = False
    # shard the cache's rows over the mesh data axis instead of replicating:
    # per-device HBM cost divides by the axis size and pods are supported
    # (each host decodes only its row block; dataset files must be visible
    # on every host). Batches route via one psum_scatter over ICI. Implies
    # --device_cache; same bit-identical sample stream (pinned by test).
    device_cache_sharded: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Network architecture config (reference L4, SURVEY.md SS2 C6/C7/C8)."""

    model: str = "pcgan"             # pcgan | comparator
    netG: str = "resnet_9blocks"     # resnet_9blocks|resnet_6blocks|unet_128|unet_256
    netD: str = "basic"              # basic | n_layers | pixel | multiscale
    ngf: int = 64
    ndf: int = 64
    n_layers_D: int = 3
    # --netD multiscale (pix2pixHD, Wang 2018): number of PatchGAN
    # discriminators, D_k scoring a 2^k-mean-pooled view. Beyond-reference
    # model family for 256px+ training; losses average over scales so
    # --lambda_* weights transfer.
    num_D: int = 2
    norm: str = "instance"           # instance | batch | group | none
    # spectral normalization of every D conv (SN-GAN, Miyato 2018): kernel
    # divided by its largest singular value (one power-iteration step per
    # training forward). Lipschitz stabilizer beyond the reference; off =
    # parity. u/sigma live in d_state (batch_stats) — the D PARAM tree is
    # unchanged, so SN/non-SN checkpoints cross-load at the params level.
    spectral_norm: bool = False
    # one SAGAN self-attention block mid-trunk of the resnet G (Zhang 2019):
    # global context at the bottleneck resolution — long-range dependencies
    # a 3x3 stack only reaches through depth. gamma starts 0 (exact identity
    # at init). resnet generators only; beyond-reference opt-in, off = parity.
    g_attn: bool = False
    # the discriminator twin: one SAGAN block after the PatchGAN's strided
    # stack (SAGAN uses attention in BOTH nets). basic/n_layers/multiscale
    # only; composes with --spectral_norm. Beyond-reference opt-in.
    d_attn: bool = False
    init_type: str = "normal"        # normal | xavier | kaiming | orthogonal
    init_gain: float = 0.02
    no_dropout: bool = True
    cond_inject: str = "input"       # input | bottleneck (where cond map concats)
    cond_mode: str = "onehot"        # onehot | score (continuous comparator score)
    # comparator (C8)
    cmp_nf: int = 64
    cmp_n_down: int = 4
    tie_margin: float = 0.5          # Thurstone-with-ties decision margin
    # numerics
    dtype: str = "bfloat16"          # compute dtype on TPU; params stay f32
    # tap-matmul reformulation of the 7x7 reflect stem/tail convs: puts
    # (kernel-tap, channel) pairs on MXU lanes instead of 3 image channels
    # (ops/lowch_conv.py). bf16-only; no-op for f32 parity runs.
    lowch_matmul: bool = True
    # int8 post-training quantization of the G TRUNK convs for INFERENCE
    # (test.py / export_serving / bench --infer): s8xs8->s32 rides the
    # MXU's ~1.6x int8 rate (measured, docs/perf_notes.md). Opt-in,
    # beyond-reference, NON-parity (outputs differ at quantization-noise
    # level); train.py rejects it (round() has zero gradient).
    quant_int8: bool = False
    remat: bool = False              # rematerialize G resnet blocks (256px HBM)
    remat_blocks: int = -1           # partial remat: only the first N blocks
                                     # recompute (-1 = all) — memory/speed dial


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + schedule config (reference train options, SURVEY.md SS2 C3/C14)."""

    lr: float = 2e-4
    # separate D learning rate (TTUR, Heusel 2017 — the two-time-scale
    # stabilizer; typically lr_d > lr). 0 = D shares --lr = reference
    # parity. Same decay shape and state tree; checkpoints cross-load.
    lr_d: float = 0.0
    # defer each print point's metric fetch to the NEXT print point so the
    # device_get never drains the dispatch pipeline (tunneled/remote PJRT
    # hosts pay ~a step of bubble per sync; direct-attached hardware pays
    # ~nothing either way). Values/step labels stay exact; imgs/s is one
    # cadence stale; the epoch's last point flushes at the boundary.
    # Beyond-reference opt-in; off = parity print timing.
    metrics_lag: bool = False
    # stream the global L2 norm of the (psum'd) G and D gradient trees as
    # grad_norm_G/grad_norm_D every print point — the standard GAN-health
    # debugging surface (vanishing D signal, G spikes before divergence).
    # Computed on device from grads the step already holds (two scalar
    # reductions; no extra passes). Beyond-reference opt-in.
    log_grad_norm: bool = False
    # stream device memory occupancy (mem_hbm_gb live, mem_hbm_peak_gb
    # high-water) every print point from the PJRT allocator's own counters
    # (device.memory_stats() — a host-side query, no device work). The
    # OOM-debugging companion to tools/memory_plan.py's AOT numbers.
    # No-op on backends without memory stats (CPU). Beyond-reference opt-in.
    log_memory: bool = False
    beta1: float = 0.5
    beta2: float = 0.999
    gan_mode: str = "lsgan"          # vanilla | lsgan | wgangp | hinge
    lambda_L1: float = 100.0         # identity/reconstruction weight
    lambda_cond: float = 10.0        # comparator condition-consistency weight
    lambda_gp: float = 10.0          # gradient penalty (wgangp only)
    # R1 zero-centered gradient penalty on REAL images (Mescheder 2018;
    # gamma — the step adds lambda_r1/2 * E[||grad_x D(x)||^2] to the D
    # loss). The StyleGAN-family stability lever for any gan_mode; pairs
    # naturally with lsgan/hinge/vanilla (wgangp already carries its own
    # interpolate penalty). Beyond-reference opt-in; 0 = off = parity.
    lambda_r1: float = 0.0
    # pix2pixHD feature-matching loss (Wang 2018 eq. 4): L1 between D's
    # intermediate features on fake vs real (gradients to G only). Works
    # with any netD; the published weight is 10. Costs one extra B-sized D
    # forward per step. Beyond-reference opt-in; 0 = off = parity.
    lambda_feat: float = 0.0
    # pix2pixHD VGG19 perceptual loss (Wang 2018; models/vgg.py): weighted
    # L1 over the five relu taps between the RECONSTRUCTION G(real, own
    # cond) and the real image — the perceptual upgrade of --lambda_L1's
    # pairing (aging has no ground-truth pair for the aged fake). The
    # published weight is 10. Needs --vgg_path (torchvision vgg19 .pth) or
    # --vgg_path random for a weightless smoke path. Beyond-reference
    # opt-in; 0 = off = parity.
    lambda_vgg: float = 0.0
    # torchvision vgg19 state_dict (.pth) for --lambda_vgg, or the literal
    # 'random' (fresh-init features — CI/smoke only, documented as such)
    vgg_path: str = ""
    pool_size: int = 50              # fake-image pool for D (C12)
    niter: int = 100                 # epochs at constant lr
    niter_decay: int = 100           # epochs of linear lr decay to 0
    lr_policy: str = "linear"        # linear | step | cosine | constant | plateau
    lr_decay_iters: int = 50
    epoch_count: int = 1
    continue_train: bool = False
    seed: int = 0
    # cadence
    print_freq: int = 100
    display_freq: int = 400
    # 'latest' checkpoint every N iters, mid-epoch included (reference
    # semantics); 0 disables mid-epoch saves (epoch boundaries still save)
    save_latest_freq: int = 5000
    save_epoch_freq: int = 5
    # retention: keep only the newest N epoch_<k> checkpoints (0 = keep all,
    # the reference's behavior; full states are large at 256px)
    max_ckpt_keep: int = 5
    # exponential moving average of G params (0 = off, the reference's
    # behavior; >0 e.g. 0.999 keeps an EMA twin of G updated in-step and
    # saved as {tag}_G_ema — a standard GAN quality lever the sampler can
    # opt into with --use_ema)
    ema_decay: float = 0.0
    # gradient accumulation (1 = off, the reference's behavior): split each
    # batch into N sequentially-scanned microbatches inside the jitted step
    # and apply ONE optimizer update on the averaged grads — batch_size
    # optimizer semantics at batch_size/N activation memory (an exact-math
    # alternative to --remat when HBM binds; pcgan_tpu/accum.py)
    grad_accum: int = 1
    # non-finite-gradient step skipping (0 = off, the reference's behavior:
    # whatever grads come out get applied). N > 0 wraps BOTH optimizers in
    # optax.apply_if_finite(N): a step whose global (post-pmean) grads
    # contain inf/nan applies a zero update instead — params, Adam moments
    # and the EMA twin all hold — and training continues; after N
    # CONSECUTIVE bad steps the wrapper stops masking so a persistent
    # divergence surfaces instead of spinning. The standard bf16 GAN
    # robustness lever; per-net skip totals stream as notfinite_G/D.
    # Changes the optimizer-state tree: must match the saved run on resume.
    skip_nonfinite: int = 0
    # DiffAugment (ops/diffaug.py; Zhao et al. 2020): comma-separated policy
    # of differentiable transforms applied to EVERY image D sees — T(real)/
    # T(fake) in the D loss, T(fake) in the G loss (grads flow through T);
    # L1/comparator losses stay on raw images. The standard lever against D
    # overfitting on small datasets (the paper-scale UTKFace setting).
    # "" = off = reference parity; e.g. "color,translation,cutout".
    diff_augment: str = ""
    # ADA — ADAPTIVE DiffAugment probability (Karras et al. 2020, "Training
    # GANs with Limited Data"). 0 = off (the --diff_augment policy, when
    # set, applies to every sample — the plain DiffAugment recipe). > 0
    # (published value 0.6): each policy op instead fires per-sample with
    # probability p, and the jitted step adapts p in-device from the
    # overfitting heuristic r_t = E[sign(D(real) - mid)] — p rises while
    # r_t > ada_target (D memorizing the reals) and decays otherwise, by
    # batch/(ada_kimg*1000) per step, clipped to [0, 1]. p lives in
    # TrainState (resume-exact); p and r_t stream as ada_p / ada_rt.
    # Requires a non-empty --diff_augment policy.
    ada_target: float = 0.0
    # ADA adaptation speed: p traverses [0,1] in ada_kimg thousand images
    ada_kimg: float = 500.0
    # warm-start G from a G-only checkpoint ("<run_name>/<tag>", resolved
    # under --checkpoints_dir; "<tag>" alone uses the current run name).
    # The reference-migration path: tools/import_pth.py converts a
    # reference .pth into such a checkpoint, and this flag fine-tunes from
    # it with fresh D/optimizers. Ignored under --continue_train.
    init_g_from: str = ""
    # comparator pretraining
    comparator_path: str = ""        # frozen comparator ckpt for the GAN cond loss
    # fraction of comparison pairs held out of pretraining for the
    # out-of-sample eval_acc_cmp metric. BEYOND-REFERENCE default (the
    # reference trains on every pair and reports train accuracy only);
    # pass 0 for strict reference parity — the eval metric is then skipped
    cmp_eval_frac: float = 0.1
    # in-training eval (BASELINE config 5 streaming FID)
    eval_fid_epoch_freq: int = 0     # 0 = off; else FID every N epochs
    eval_fid_images: int = 512
    # evaluate the EMA twin instead of the live params (needs
    # --ema_decay > 0) — the standard GAN practice: the EMA G is what
    # ships, so its FID is the number that matters. Off by default (live
    # params, matching what the reference would report).
    eval_use_ema: bool = False


@dataclass(frozen=True)
class ParallelConfig:
    """Mesh / sharding config (SURVEY.md SS3.1/SS3.2 — the new repo's `parallel/`)."""

    mesh_shape: Tuple[int, ...] = (-1,)   # -1 == all local devices on the axis
    mesh_axes: Tuple[str, ...] = ("data",)
    spatial_shards: int = 1               # >1: shard H dim of activations (256px HBM relief)
    # ZeRO stage 1 (Rajbhandari 2020): shard BOTH Adam trees (2x params in
    # f32 — the largest resident-state term) over the data axis; params/EMA
    # stay replicated. GSPMD derives the reduce-scatter(grads) ->
    # shard-update -> all-gather(delta) schedule from the shardings. Routes
    # training through the GSPMD step (parallel/auto.py). Beyond-reference
    # opt-in; needs a data axis > 1.
    zero1: bool = False
    # ICI x DCN hybrid mesh (multislice growth path): the data axis factors
    # granule-major over this many DCN-connected granules (TPU slices; or
    # processes where slice metadata is absent), so only data-axis
    # collectives (one gradient-sized reduction per step; with --zero1 the
    # equivalent reduce-scatter + all-gather pair) cross DCN, and every
    # per-layer collective (spatial halos, model gathers) stays on ICI.
    # 1 = single-slice (all axes ICI) = default.
    dcn_data: int = 1


@dataclass(frozen=True)
class RunConfig:
    """Experiment bookkeeping (reference `--name`, checkpoints dir, test opts)."""

    name: str = "experiment"
    checkpoints_dir: str = "./checkpoints"
    results_dir: str = "./results"
    phase: str = "train"
    epoch: str = "latest"            # which checkpoint to load at test time
    use_ema: bool = False            # sample from the EMA G twin ({tag}_G_ema)
    num_test: int = 50
    # smooth aging animation (test.py): render an N-frame condition sweep
    # per test image and save it as a looping animated GIF next to the
    # grid. score mode sweeps the continuous range; onehot mode blends
    # adjacent bins' one-hots (soft labels). 0 = off = reference parity.
    anim: int = 0
    # FID feature space: 'random' (fixed-seed conv net, in-sandbox default),
    # 'comparator' (pretrained comparator trunk via --comparator_path), or
    # 'pth:<file>' (imported torchvision/pytorch-fid InceptionV3 —
    # externally comparable numbers)
    fid_features: str = "random"
    # precomputed real-side FID statistics file (.npz from
    # tools/compute_fid_stats.py — the pytorch-fid workflow): "fid" is
    # then measured against this FROZEN reference (comparable across
    # eval runs/budgets); the same-pass streamed number stays available
    # as "fid_stream". "" = off = stream reals (reference behavior).
    fid_stats: str = ""
    # KID (ops/kid.py): unbiased small-sample companion metric to FID,
    # computed from the SAME eval pass/features wherever FID runs
    # (evaluate.py and in-training --eval_fid_epoch_freq). Off by default
    # (FID is the reference-parity metric); beyond-reference opt-in.
    kid: bool = False
    kid_subsets: int = 100           # random subsets averaged (clean-fid default)
    kid_subset_size: int = 1000      # features per subset (clamped to n)
    # precision/recall/density/coverage (ops/prdc.py): k-NN manifold metrics
    # factoring a bad FID into lost FIDELITY (precision/density) vs lost
    # DIVERSITY (recall/coverage), from the SAME eval pass/features. Off by
    # default (FID is the reference-parity metric); beyond-reference opt-in.
    prdc: bool = False
    prdc_k: int = 5                  # k-NN neighborhood size (prdc-pkg default)
    # Inception Score (ops/is_score.py, Salimans 2016): classifier-head
    # softmax over the SAME retained fake features (zero extra forwards);
    # faithful with --fid_features pth:<inception .pth> (imports its fc.*),
    # seeded-random head under --fid_features random (smoke only).
    is_score: bool = False
    is_splits: int = 10              # published protocol: mean +/- std over 10
    # SSIM identity preservation (ops/ssim.py): mean SSIM between each input
    # face and its age-translated output, from the same eval pass — the
    # label-free identity-drift proxy face-aging papers report
    ssim: bool = False
    # LPIPS perceptual identity drift (ops/lpips.py, Zhang 2018): mean
    # lpips-vgg distance between each input face and its aged output, from
    # the same eval pass — the CALIBRATED perceptual twin of --ssim (lower
    # = closer). Needs a VGG16 trunk (--lpips_vgg16); --lpips_lins adds the
    # package's learned calibration (uniform 1/C fallback otherwise,
    # reported under the distinct 'lpips_uniform' key). Beyond-reference
    # opt-in.
    lpips: bool = False
    lpips_vgg16: str = ""            # torchvision vgg16 .pth | 'random'
    lpips_lins: str = ""             # lpips-package LPIPS(net='vgg') .pth
    # per-age-bin conditional FID: FID between bin-b reals and bin-b-targeted
    # fakes for every bin (the per-age-group breakdown aging papers report;
    # a good marginal FID can hide a collapsed extreme age). onehot mode
    # only; beyond-reference opt-in.
    fid_per_bin: bool = False
    verbose: bool = False
    # TensorBoard mirroring ("" = off): every metrics.jsonl scalar is also
    # written as a standard events.out.tfevents.* file under
    # <tb_logdir>/<name>/ (stdlib encoder, utils/tb_writer.py — no
    # tensorflow/tensorboard runtime dependency). Point `tensorboard
    # --logdir <tb_logdir>` at it; beyond-reference opt-in (the reference
    # logs to visdom + loss_log.txt).
    tb_logdir: str = ""
    # persistent XLA compilation-cache directory ("" = off): compiled
    # executables are reused across processes — the second run of the same
    # config skips XLA compilation (measured: 128px train first-step
    # latency 35.2 -> 17.4 s). Numerics identical; purely a startup lever.
    compile_cache: str = ""
    # XLA compiler options for the train-step jit ("k=v[,k=v]"). "" = the
    # measured TPU-bf16 default (scoped-VMEM 32 MiB: +1.9% @128px, +6.5%
    # @256px — perf_notes r3); "off" = stock XLA; f32/CPU runs always use
    # stock XLA (the .pth-parity lowering is never touched).
    xla_opt: str = ""
    isTrain: bool = True
    profile_steps: int = 0           # >0: jax.profiler trace of N steps
    # >0: start jax.profiler's gRPC server on this port at startup — live
    # on-demand trace capture from TensorBoard's profile plugin (or
    # jax.profiler.trace tooling) against a RUNNING training job, no
    # restart needed. Complements --profile_steps (fixed-window trace at
    # loop start). Beyond-reference opt-in.
    profile_server: int = 0
    # numerics sanitizer (SURVEY.md SS6): jax_debug_nans raises at the
    # producing primitive. checkify was evaluated and rejected: float_checks
    # through the doubly-differentiated GAN step exploded compile time
    # (>28 min for the 32px smoke config).
    debug_nans: bool = False


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    run: RunConfig = field(default_factory=RunConfig)

    @property
    def cond_nc(self) -> int:
        """Condition-channel width fed to G/D: one-hot over bins, or a single
        continuous comparator-score channel (the paper's score-conditioning
        variant, SURVEY.md SS2 C6/C11 'one-hot or score map')."""
        return 1 if self.model.cond_mode == "score" else self.data.n_age_bins

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    def save(self, path: str) -> None:
        """Serialize next to checkpoints (reference dumps `opt.txt`)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())


def replace(cfg, **kw):
    """`dataclasses.replace` passthrough for nested one-level updates."""
    return dataclasses.replace(cfg, **kw)


# --------------------------------------------------------------------------- #
# opt.json run-config layering
# --------------------------------------------------------------------------- #

# Structural keys adopted from a saved run's opt.json by checkpoint-CONSUMING
# CLIs (test.py / evaluate.py / tools, and train.py under --continue_train):
# the fields that must match the saved run for its checkpoints to restore and
# sample correctly — network architecture, condition encoding, input geometry
# — plus (resume only) the TrainState-tree togglers a resumed run must match.
# Everything else (dataroot, batch size, cadences, loss weights, ...) stays
# under the caller's control. Explicit CLI flags always override; conflicts
# with the saved structural value warn loudly (the exact failure that used to
# surface as an opaque orbax tree-structure error).
_OPT_STRUCTURAL = {
    "data": ("input_nc", "output_nc", "n_age_bins", "max_age",
             "load_size", "crop_size"),
    "model": ("netG", "netD", "ngf", "ndf", "n_layers_D", "num_D", "norm",
              "spectral_norm", "g_attn", "d_attn", "no_dropout", "cond_inject",
              "cond_mode", "cmp_nf", "cmp_n_down", "dtype", "lowch_matmul"),
}
# adopted ONLY when resuming training (state-tree/loss-wiring togglers whose
# silent loss would corrupt or crash the resumed run)
_OPT_RESUME_TRAIN = ("ema_decay", "skip_nonfinite", "comparator_path")


def load_run_opt(checkpoints_dir: str, name: str) -> Optional[dict]:
    """Read ``<checkpoints_dir>/<name>/opt.json`` (written by train.py).
    Returns the raw nested dict, or None if absent/unreadable (legacy runs
    predating the dump, or hand-assembled checkpoint dirs)."""
    path = os.path.join(checkpoints_dir, name, "opt.json")
    try:
        with open(path) as f:
            opt = json.load(f)
    except (OSError, ValueError):
        return None
    return opt if isinstance(opt, dict) else None


def amend_run_opt(checkpoints_dir: str, name: str, key: str, value) -> None:
    """Merge one top-level key into a run's opt.json (atomic replace).

    train.py uses this to record facts that are only known AFTER flag
    parsing — e.g. the ``split`` record (resolved dataset length + phase
    root) that lets evaluate.py PROVE it reproduces the training run's
    --holdout_frac permutation instead of silently deriving a different
    one (ADVICE r4: the split is a pure function of (len(ds), seed), so a
    different directory or row count at eval time mixes trained-on rows
    into holdout_* keys)."""
    path = os.path.join(checkpoints_dir, name, "opt.json")
    try:
        with open(path) as f:
            opt = json.load(f)
    except (OSError, ValueError):
        opt = {}
    if not isinstance(opt, dict):
        opt = {}
    opt[key] = value
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(opt, f, indent=2, default=str)
    os.replace(tmp, path)


def opt_value(opt: Optional[dict], section: str, flag: str, fallback):
    """One saved value out of a load_run_opt() dict, or `fallback` when the
    dict/section/key is absent (tools with their own argparse use this to
    resolve explicit > opt.json > hard default)."""
    if opt is not None and isinstance(opt.get(section), dict) \
            and flag in opt[section]:
        return opt[section][flag]
    return fallback


def _layer_opt_defaults(sections: dict, opt: dict, *, resume: bool,
                        path: str) -> None:
    """Underlay opt.json's structural values beneath the explicit flags in
    `sections` (in place). Explicit flags win; explicit values that DIFFER
    from the saved run's structural value print one warning line each."""
    wanted = dict(_OPT_STRUCTURAL)
    if resume:
        wanted["train"] = _OPT_RESUME_TRAIN
    adopted, conflicts = [], []
    for section, keys in wanted.items():
        saved = opt.get(section)
        if not isinstance(saved, dict):
            continue
        fields = {f.name: f for f in dataclasses.fields(_SECTION_TYPES[section])}
        for key in keys:
            if key not in saved or key not in fields:
                continue
            val = saved[key]
            default = fields[key].default
            if default is not None and not isinstance(val, type(default)):
                try:                      # json round-trips 2.0 -> 2.0 but a
                    val = type(default)(val)   # hand-edited "2" should coerce
                except (TypeError, ValueError):
                    continue
            if key in sections[section]:
                if sections[section][key] != val:
                    conflicts.append(
                        f"--{key} {sections[section][key]!r} "
                        f"(run was trained with {val!r})")
                continue
            if val != default:
                adopted.append(f"{key}={val!r}")
            sections[section][key] = val
    if adopted:
        print(f"config: from {path}: {', '.join(adopted)} "
              f"(explicit flags override; --no-from_opt disables)",
              flush=True)
    for c in conflicts:
        # overriding can be legitimate (e.g. sampling a fully-conv G at a
        # different crop_size, or f32 sampling of a bf16 run) — note it
        # loudly, don't block
        print(f"config: note: explicit {c} — overriding the saved run's "
              f"opt.json value", flush=True)


# --------------------------------------------------------------------------- #
# CLI — reference-compatible flag surface
# --------------------------------------------------------------------------- #

# flag -> (section, field). Names mirror the reference's public options
# (train.py/test.py-style) so reference users can switch without relearning.
_FLAG_MAP = {
    # base options
    "dataroot": ("data", "dataroot"),
    "dataset_mode": ("data", "dataset_mode"),
    "load_size": ("data", "load_size"),
    "crop_size": ("data", "crop_size"),
    "preprocess": ("data", "preprocess"),
    "no_flip": ("data", "no_flip"),
    "serial_batches": ("data", "serial_batches"),
    "num_threads": ("data", "num_threads"),
    "host_decode_m": ("data", "host_decode_m"),
    "host_resize": ("data", "host_resize"),
    "native_size": ("data", "native_size"),
    "max_dataset_size": ("data", "max_dataset_size"),
    "holdout_frac": ("data", "holdout_frac"),
    "labels_csv": ("data", "labels_csv"),
    "comparisons_csv": ("data", "comparisons_csv"),
    "batch_size": ("data", "batch_size"),
    "input_nc": ("data", "input_nc"),
    "output_nc": ("data", "output_nc"),
    "n_age_bins": ("data", "n_age_bins"),
    "pallas_pipeline": ("data", "pallas_pipeline"),
    "prefetch": ("data", "prefetch"),
    "device_cache": ("data", "device_cache"),
    "device_cache_sharded": ("data", "device_cache_sharded"),
    "model": ("model", "model"),
    "netG": ("model", "netG"),
    "netD": ("model", "netD"),
    "ngf": ("model", "ngf"),
    "ndf": ("model", "ndf"),
    "n_layers_D": ("model", "n_layers_D"),
    "num_D": ("model", "num_D"),
    "norm": ("model", "norm"),
    "spectral_norm": ("model", "spectral_norm"),
    "g_attn": ("model", "g_attn"),
    "d_attn": ("model", "d_attn"),
    "init_type": ("model", "init_type"),
    "init_gain": ("model", "init_gain"),
    "no_dropout": ("model", "no_dropout"),
    "cond_inject": ("model", "cond_inject"),
    "cond_mode": ("model", "cond_mode"),
    "cmp_nf": ("model", "cmp_nf"),
    "cmp_n_down": ("model", "cmp_n_down"),
    "tie_margin": ("model", "tie_margin"),
    "dtype": ("model", "dtype"),
    "remat": ("model", "remat"),
    "remat_blocks": ("model", "remat_blocks"),
    "lowch_matmul": ("model", "lowch_matmul"),
    "quant_int8": ("model", "quant_int8"),
    "name": ("run", "name"),
    "checkpoints_dir": ("run", "checkpoints_dir"),
    "verbose": ("run", "verbose"),
    # train options
    "lr": ("train", "lr"),
    "lr_d": ("train", "lr_d"),
    "metrics_lag": ("train", "metrics_lag"),
    "log_grad_norm": ("train", "log_grad_norm"),
    "log_memory": ("train", "log_memory"),
    "beta1": ("train", "beta1"),
    "gan_mode": ("train", "gan_mode"),
    "lambda_L1": ("train", "lambda_L1"),
    "lambda_cond": ("train", "lambda_cond"),
    "lambda_gp": ("train", "lambda_gp"),
    "lambda_r1": ("train", "lambda_r1"),
    "lambda_feat": ("train", "lambda_feat"),
    "lambda_vgg": ("train", "lambda_vgg"),
    "vgg_path": ("train", "vgg_path"),
    "skip_nonfinite": ("train", "skip_nonfinite"),
    "pool_size": ("train", "pool_size"),
    "niter": ("train", "niter"),
    "niter_decay": ("train", "niter_decay"),
    "lr_policy": ("train", "lr_policy"),
    "lr_decay_iters": ("train", "lr_decay_iters"),
    "epoch_count": ("train", "epoch_count"),
    "continue_train": ("train", "continue_train"),
    "seed": ("train", "seed"),
    "print_freq": ("train", "print_freq"),
    "display_freq": ("train", "display_freq"),
    "save_latest_freq": ("train", "save_latest_freq"),
    "save_epoch_freq": ("train", "save_epoch_freq"),
    "max_ckpt_keep": ("train", "max_ckpt_keep"),
    "ema_decay": ("train", "ema_decay"),
    "grad_accum": ("train", "grad_accum"),
    "diff_augment": ("train", "diff_augment"),
    "ada_target": ("train", "ada_target"),
    "ada_kimg": ("train", "ada_kimg"),
    "init_g_from": ("train", "init_g_from"),
    "comparator_path": ("train", "comparator_path"),
    "cmp_eval_frac": ("train", "cmp_eval_frac"),
    "eval_fid_epoch_freq": ("train", "eval_fid_epoch_freq"),
    "eval_fid_images": ("train", "eval_fid_images"),
    "eval_use_ema": ("train", "eval_use_ema"),
    # test options
    "results_dir": ("run", "results_dir"),
    "phase": ("run", "phase"),
    "epoch": ("run", "epoch"),
    "use_ema": ("run", "use_ema"),
    "num_test": ("run", "num_test"),
    "anim": ("run", "anim"),
    "fid_features": ("run", "fid_features"),
    "fid_stats": ("run", "fid_stats"),
    "kid": ("run", "kid"),
    "kid_subsets": ("run", "kid_subsets"),
    "kid_subset_size": ("run", "kid_subset_size"),
    "prdc": ("run", "prdc"),
    "prdc_k": ("run", "prdc_k"),
    "is_score": ("run", "is_score"),
    "is_splits": ("run", "is_splits"),
    "ssim": ("run", "ssim"),
    "lpips": ("run", "lpips"),
    "lpips_vgg16": ("run", "lpips_vgg16"),
    "lpips_lins": ("run", "lpips_lins"),
    "fid_per_bin": ("run", "fid_per_bin"),
    "profile_steps": ("run", "profile_steps"),
    "profile_server": ("run", "profile_server"),
    "tb_logdir": ("run", "tb_logdir"),
    "compile_cache": ("run", "compile_cache"),
    "xla_opt": ("run", "xla_opt"),
    "debug_nans": ("run", "debug_nans"),
    # parallel
    "spatial_shards": ("parallel", "spatial_shards"),
    "zero1": ("parallel", "zero1"),
    "dcn_data": ("parallel", "dcn_data"),
}

_SECTION_TYPES = {
    "data": DataConfig,
    "model": ModelConfig,
    "train": TrainConfig,
    "parallel": ParallelConfig,
    "run": RunConfig,
}

# help text for flags whose behavior is not obvious from the name —
# especially levers beyond the reference and any default that changes
# numerics (project convention: such changes must be called out)
_FLAG_HELP = {
    "lowch_matmul": "tap-matmul reformulation of the 7x7 stem/tail convs "
                    "(ops/lowch_conv.py). bf16-only PERF path, ON by "
                    "default: changes bf16 float association vs the naive "
                    "lowering (tested to 3e-2 of f32); f32 parity runs are "
                    "unaffected. --no-lowch_matmul restores the naive "
                    "bf16 lowering",
    "host_decode_m": "libjpeg DCT-domain decode scale M/8 (8 = full-scale "
                     "bit-parity with PIL). M<8 is a NON-parity fast path "
                     "for core-starved hosts",
    "holdout_frac": "seeded held-out row fraction: train on (1-f) of the "
                     "dataset, eval reports train-split AND held-out "
                     "metrics side by side (eval_* / eval_h_*); 0 = "
                     "reference parity",
    "host_resize": "PIL-resize to load_size on the host before transfer "
                   "(the reference's own CPU transform; parity-faithful) — "
                   "~2x fewer host->device bytes for transfer-bound links. "
                   "Default off: resize runs on device (TPU-native)",
    "lr_d": "separate discriminator learning rate (TTUR, Heusel 2017): the "
            "two-time-scale stabilizer, typically lr_d > lr. Shares the "
            "--lr_policy decay shape. Beyond-reference opt-in; 0 = D "
            "uses --lr = parity",
    "profile_server": "start jax.profiler's gRPC server on this PORT at "
                      "startup: live on-demand trace capture from "
                      "TensorBoard's profile plugin against the running "
                      "job (0 = off). Complements --profile_steps",
    "log_grad_norm": "stream grad_norm_G/grad_norm_D (global L2 norm of "
                     "the gradient trees, post-allreduce) every print "
                     "point — the GAN-health debugging surface. "
                     "Beyond-reference opt-in",
    "log_memory": "stream mem_hbm_gb / mem_hbm_peak_gb (PJRT allocator "
                  "counters) every print point — live OOM debugging next "
                  "to tools/memory_plan.py's AOT numbers. No-op on "
                  "backends without memory stats. Beyond-reference opt-in",
    "tb_logdir": "mirror every logged scalar into a TensorBoard event file "
                 "under <tb_logdir>/<name>/ (stdlib tfevents encoder; no "
                 "tensorflow dependency). metrics.jsonl remains the source "
                 "of truth; beyond-reference opt-in ('' = off)",
    "metrics_lag": "defer each print point's metric fetch to the NEXT "
                   "print point so the device_get never drains the device "
                   "dispatch pipeline — recovers the per-print sync bubble "
                   "on tunneled/remote PJRT hosts (measured +34% at "
                   "--print_freq 1). Values and step labels stay exact; "
                   "the imgs/s column is one print-cadence stale. GAN "
                   "training loop only (comparator pretraining prints "
                   "eagerly). Beyond-reference opt-in; off = parity "
                   "print timing",
    "num_D": "with --netD multiscale: number of PatchGAN discriminators "
             "(pix2pixHD, Wang 2018) — D_k scores a 2^k-mean-pooled view; "
             "per-scale losses average so --lambda_* weights transfer. "
             "Beyond-reference model family (basic/n_layers/pixel are the "
             "parity surface)",
    "zero1": "ZeRO stage 1: shard BOTH Adam moment trees (2x params in f32 "
             "— the largest resident-state term) over the mesh data axis; "
             "params and the EMA twin stay replicated so forward/backward "
             "never gather weights. XLA derives the reduce-scatter(grads) "
             "-> shard-update -> all-gather(delta) schedule from the "
             "shardings (GSPMD step). Composes with --mesh_axes "
             "data,model. Beyond-reference opt-in; needs a data axis > 1",
    "dcn_data": "multislice hybrid mesh: factor the data axis granule-major "
                "over this many DCN-connected granules (TPU slices; "
                "processes where slice metadata is absent) so ONLY "
                "data-axis collectives (one gradient-sized reduction per "
                "step; with --zero1 the equivalent reduce-scatter + "
                "all-gather pair) cross DCN — spatial halos and model-axis "
                "gathers stay on ICI. Must equal the slice count and "
                "divide the data axis. 1 = single-slice = default",
    "spectral_norm": "spectral normalization of every discriminator conv "
                     "(SN-GAN, Miyato 2018): kernels divided by their "
                     "largest singular value, one power-iteration step per "
                     "training forward — the Lipschitz-constraint GAN "
                     "stabilizer next to --lambda_r1/--lr_d/--diff_augment. "
                     "Beyond-reference opt-in; off = parity. The D param "
                     "tree is unchanged (u/sigma live in d_state), so "
                     "SN and non-SN checkpoints cross-load at the params "
                     "level (d_state structure must match on resume)",
    "lambda_r1": "gamma for the R1 zero-centered gradient penalty on real "
                 "images (Mescheder 2018): adds gamma/2 * E[||grad_x "
                 "D(x)||^2] to the D loss — the StyleGAN-family stability "
                 "lever for small-dataset GANs. Works with any gan_mode "
                 "(wgangp already carries its own interpolate penalty). "
                 "Beyond-reference opt-in; 0 = off = parity. Typical "
                 "values 0.1-10; streams as loss_D_r1",
    "lambda_feat": "pix2pixHD feature-matching weight (Wang 2018 eq. 4): L1 "
                   "between the discriminator's intermediate features on "
                   "fake vs real, gradients to G only — the standard "
                   "perceptual-ish stabilizer for multiscale D (works with "
                   "any --netD). Published value 10. Costs one extra "
                   "B-sized D forward per step; streams as loss_G_feat. "
                   "Beyond-reference opt-in; 0 = off = parity",
    "skip_nonfinite": "N > 0: a train step whose gradients contain inf/nan "
                      "applies a ZERO update (params/Adam moments/EMA hold) "
                      "instead of poisoning the run; after N consecutive "
                      "bad steps updates pass through again so persistent "
                      "divergence surfaces. bf16 GAN robustness lever "
                      "beyond the reference (0 = off = parity). Changes "
                      "the optimizer-state tree: must match the saved run "
                      "when resuming",
    "fid_stats": "precomputed real-side FID statistics .npz "
                 "(tools/compute_fid_stats.py): 'fid' is measured against "
                 "this FROZEN full-dataset reference — comparable across "
                 "eval runs and budgets; the same-pass streamed number "
                 "still reports as 'fid_stream'. KID/PRDC/per-bin keep "
                 "using the streamed reals. '' = off = stream reals",
    "kid": "also compute KID (Kernel Inception Distance) from the same "
           "eval pass/features as FID — the UNBIASED small-sample metric "
           "(trustworthy at few-hundred-image budgets where FID's bias "
           "dominates). Beyond-reference opt-in; adds kid/kid_std to "
           "eval outputs",
    "kid_subsets": "with --kid: number of random subsets the unbiased "
                   "MMD^2 estimator averages over",
    "kid_subset_size": "with --kid: features per subset (clamped to the "
                       "eval budget when smaller)",
    "prdc": "also report precision/recall/density/coverage (k-NN manifold "
            "metrics, Kynkaanniemi 2019 / Naeem 2020) from the same eval "
            "pass/features as FID — factors a bad score into lost fidelity "
            "(precision/density) vs lost diversity (recall/coverage). "
            "Beyond-reference opt-in",
    "prdc_k": "with --prdc: k-NN neighborhood size (needs eval budget > k "
              "per side; 5 = the reference prdc package default)",
    "is_score": "also report the Inception Score (Salimans 2016) of the "
                "generated images: exp(E KL(p(y|x) || p(y))) over the "
                "classifier head applied to the same retained fake "
                "features (is_mean/is_std). Faithful with --fid_features "
                "pth:<inception .pth> (imports its fc.*); random features "
                "get a seeded random head (smoke only). Beyond-reference "
                "opt-in",
    "is_splits": "with --is_score: number of chunks the mean/std protocol "
                 "splits the fakes into (published default 10)",
    "lpips": "also report mean lpips-vgg distance between each input face "
             "and its aged output (Zhang 2018) — the calibrated perceptual "
             "twin of --ssim, from the same eval pass; needs --lpips_vgg16",
    "lpips_vgg16": "VGG16 trunk for --lpips: torchvision vgg16 .pth, or "
                   "'random' (fresh-init features, smoke/CI only)",
    "lpips_lins": "optional lpips-package LPIPS(net='vgg') .pth carrying "
                  "the learned per-channel calibration; omitted = uniform "
                  "1/C weighting, reported under the distinct key "
                  "'lpips_uniform' (not comparable to published LPIPS)",
    "ssim": "also report mean SSIM between each input face and its "
            "age-translated output — the label-free identity-preservation "
            "proxy (Wang 2004 protocol: 11x11 Gaussian window, valid conv, "
            "data range 2). From the same eval pass as FID. "
            "Beyond-reference opt-in",
    "fid_per_bin": "also report conditional FID per age bin (fid_bin_<b> + "
                   "fid_per_bin_mean): bin-b reals vs bin-b-targeted fakes "
                   "— catches a collapsed extreme age a good marginal FID "
                   "hides. onehot mode only; bins with <2 rows on either "
                   "side are skipped",
    "native_size": "square host-decode canvas in px for folder datasets; "
                   "0 (default) auto-detects from the first image "
                   "(UTKFace 200, CACD 250 — uniform-size folders then "
                   "decode with NO host resample). Pin explicitly for "
                   "mixed-size folders",
    "ema_decay": "keep an EMA twin of G saved as {tag}_G_ema (quality "
                 "lever beyond the reference; 0 = off = reference parity). "
                 "Must match the saved run when resuming",
    "grad_accum": "split each batch into N scanned microbatches inside the "
                  "step, ONE optimizer update on averaged grads — same "
                  "optimizer semantics at 1/N activation memory (exact-math "
                  "HBM dial beyond the reference; 1 = off)",
    "diff_augment": "DiffAugment policy (comma-separated from color,"
                    "translation,cutout): random differentiable transforms "
                    "on every image D sees — the standard anti-overfitting "
                    "lever for small datasets (Zhao et al. 2020). L1/"
                    "comparator losses keep raw images. Beyond-reference "
                    "opt-in; '' = off = parity",
    "g_attn": "add one SAGAN self-attention block mid-trunk of the resnet "
              "generator (Zhang 2019): global context at the bottleneck "
              "resolution; gamma starts 0 so init is an exact identity. "
              "resnet G only. Beyond-reference opt-in; off = parity",
    "d_attn": "add one SAGAN self-attention block after the PatchGAN D's "
              "strided stack (SAGAN puts attention in both nets): global "
              "patch context; gamma starts 0 so init scores identically to "
              "the plain D. basic/n_layers/multiscale only; composes with "
              "--spectral_norm. Beyond-reference opt-in; off = parity",
    "lambda_vgg": "pix2pixHD VGG19 perceptual loss between the "
                  "reconstruction and the real image (weighted L1 over the "
                  "five relu taps; published weight 10). Needs --vgg_path. "
                  "Beyond-reference opt-in; 0 = off = parity",
    "vgg_path": "torchvision vgg19 state_dict (.pth) for --lambda_vgg, or "
                "'random' for fresh-init features (smoke/CI only)",
    "ada_target": "ADA (Karras 2020): > 0 makes the --diff_augment policy "
                  "ADAPTIVE — each op fires per-sample with probability p, "
                  "and the step steers p so the D-overfitting heuristic "
                  "r_t = E[sign(D(real)-mid)] tracks this target (published "
                  "0.6). p lives in TrainState; streams as ada_p/ada_rt. "
                  "Beyond-reference opt-in; 0 = off",
    "ada_kimg": "ADA adaptation speed: p traverses [0,1] over ada_kimg "
                "thousand images (default 500)",
    "remat": "rematerialize G resnet/unet blocks in the backward pass "
             "(HBM relief for 256px large batches)",
    "quant_int8": "int8 post-training quantization of the G trunk convs "
                  "for INFERENCE (test/export/bench --infer): rides the "
                  "MXU's ~1.6x int8 rate. Beyond-reference NON-parity "
                  "lever (outputs differ at quantization-noise level); "
                  "rejected by train.py",
    "use_ema": "sample from the {tag}_G_ema twin (needs --ema_decay "
               "training)",
    "anim": "N > 0: also render an N-frame SMOOTH aging animation per test "
            "image (looping GIF next to the grid, one extra batched "
            "forward). score mode sweeps the continuous range [-1,1]; "
            "onehot mode linearly blends adjacent bins' one-hots. "
            "Beyond-reference opt-in; 0 = off = grids only",
    "eval_use_ema": "in-training eval (--eval_fid_epoch_freq) scores the "
                    "EMA twin instead of the live params (needs "
                    "--ema_decay > 0) — the EMA G is what ships, so its "
                    "FID is the number that matters",
    "verbose": "print each network's full parameter tree at startup "
               "(param counts always print, like the reference's "
               "print_networks)",
    "compile_cache": "persistent XLA compilation-cache DIRECTORY: compiled "
                     "executables are reused across processes, so the "
                     "second run of the same config skips XLA compilation "
                     "(measured -51%% first-step latency at 128px). "
                     "Numerics identical; '' = off",
    "xla_opt": "XLA compiler options for the train-step jit, "
               "'key=value[,key=value]'. Default '' applies the MEASURED "
               "TPU-bf16 default (xla_tpu_scoped_vmem_limit_kib=32768: "
               "+1.9%% @128px, +6.5%% @256px train throughput — "
               "perf_notes r3); 'off' = stock XLA. f32/CPU runs always "
               "use stock XLA (the .pth-parity lowering is untouched, "
               "same convention as lowch_matmul)",
    "init_g_from": "warm-start G from a G-only checkpoint "
                   "('<run_name>/<tag>'), e.g. an imported reference .pth",
    "device_cache": "upload the whole dataset to HBM once and gather "
                    "batches ON DEVICE — per-step host->device traffic "
                    "drops to the batch indices. Beyond-reference perf "
                    "lever for datasets that fit HBM; sample stream is "
                    "bit-identical to the host Loader. Single-process "
                    "only; consumed by train.py and bench.py (single-pass "
                    "CLIs like test.py/evaluate.py note and ignore it)",
    "device_cache_sharded": "shard the device cache's rows over the mesh "
                            "data axis instead of replicating (implies "
                            "--device_cache): per-device HBM cost divides "
                            "by the axis size, pods supported (each host "
                            "decodes only its row block), batches route "
                            "via one psum_scatter over ICI; same "
                            "bit-identical sample stream",
}


def build_parser(is_train: bool = True) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="pcgan_tpu — TPU-native PC-GAN "
        + ("training" if is_train else "testing"),
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    seen = set()
    for flag, (section, fname) in _FLAG_MAP.items():
        if flag in seen:
            continue
        seen.add(flag)
        f = next(x for x in dataclasses.fields(_SECTION_TYPES[section]) if x.name == fname)
        default = f.default
        help_text = _FLAG_HELP.get(flag)
        if f.type in ("bool", bool) or isinstance(default, bool):
            # boolean flags: store_true if default False, BooleanOptionalAction-ish otherwise
            if default is False:
                p.add_argument(f"--{flag}", action="store_true", default=None,
                               help=help_text)
            else:
                p.add_argument(f"--{flag}", action=argparse.BooleanOptionalAction,
                               default=None, help=help_text)
        else:
            typ = type(default) if default is not None else str
            p.add_argument(f"--{flag}", type=typ, default=None, help=help_text)
    p.add_argument("--mesh_shape", type=str, default=None,
                   help="comma-separated mesh, e.g. '8' or '4,2' "
                        "(axes data[,spatial]); -1 = all devices")
    p.add_argument("--mesh_axes", type=str, default=None,
                   help="comma-separated axis names for --mesh_shape, a "
                        "subset of data,spatial,model (default: "
                        "data[,spatial] by position). 'model' shards "
                        "params + optimizer + EMA over the axis (tensor/"
                        "weight parallelism via GSPMD, parallel/auto.py)")
    # reference-CLI compatibility: accepted and ignored (visdom/display-server
    # and torch-device options have no TPU equivalent; noted in README)
    for ignored in ("gpu_ids", "display_id", "display_port", "display_server",
                    "display_env", "display_winsize", "update_html_freq",
                    "suffix", "load_iter", "ntest", "aspect_ratio"):
        p.add_argument(f"--{ignored}", type=str, default=None,
                       help="accepted for reference CLI compatibility; ignored")
    p.add_argument("--no_html", action="store_true", default=None,
                   help="accepted for reference CLI compatibility; ignored")
    p.add_argument("--from_opt", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="default the run's STRUCTURAL flags (architecture, "
                        "condition encoding, input geometry) from "
                        "<checkpoints_dir>/<name>/opt.json saved at training "
                        "time. ON by default for checkpoint-consuming CLIs "
                        "(test/evaluate, and train --continue_train, which "
                        "also adopts the state-tree togglers ema_decay/"
                        "skip_nonfinite/comparator_path); explicit flags "
                        "always override. --no-from_opt = the reference's "
                        "behavior (every flag must be retyped to match)")
    p.add_argument("--eval", action="store_true", default=None,
                   help="accepted for reference CLI compatibility; a no-op "
                        "here because sampling/eval ALWAYS runs eval-mode "
                        "norms and dropout (train=False) — the behavior the "
                        "reference flag opts into")
    return p


def parse_config(argv=None, is_train: bool = True,
                 opt_defaults: str = "off") -> Config:
    """Parse argv into a Config; only explicitly-passed flags override defaults.

    opt_defaults — whether the saved run's opt.json underlays the defaults
    (see --from_opt): "off" (never), "on" (checkpoint-consuming CLIs:
    test.py / evaluate.py), "resume" (train.py: only under --continue_train,
    which additionally adopts the state-tree togglers).
    """
    assert opt_defaults in ("off", "on", "resume"), opt_defaults
    args = build_parser(is_train).parse_args(argv)
    sections = {k: {} for k in _SECTION_TYPES}
    for flag, (section, fname) in _FLAG_MAP.items():
        v = getattr(args, flag, None)
        if v is not None:
            sections[section][fname] = v
    mode = opt_defaults
    if mode == "resume" and not sections["train"].get("continue_train"):
        mode = "off"
    if args.from_opt:                    # explicit opt-in forces it anywhere
        mode = "on"
    elif args.from_opt is False:
        mode = "off"
    if mode != "off":
        cdir = sections["run"].get("checkpoints_dir",
                                   RunConfig.checkpoints_dir)
        name = sections["run"].get("name", RunConfig.name)
        opt = load_run_opt(cdir, name)
        if opt is not None:
            _layer_opt_defaults(sections, opt,
                                resume=(opt_defaults == "resume"),
                                path=os.path.join(cdir, name, "opt.json"))
        elif args.from_opt:
            raise SystemExit(f"--from_opt: no readable opt.json under "
                             f"{os.path.join(cdir, name)}")
    if args.mesh_axes is not None and args.mesh_shape is None:
        raise SystemExit("--mesh_axes requires --mesh_shape")
    if args.mesh_shape is not None:
        sections["parallel"]["mesh_shape"] = tuple(
            int(x) for x in args.mesh_shape.split(","))
        n = len(sections["parallel"]["mesh_shape"])
        if args.mesh_axes is not None:
            axes = tuple(a.strip() for a in args.mesh_axes.split(","))
            valid = ("data", "spatial", "model")
            if (len(axes) != n or len(set(axes)) != len(axes)
                    or any(a not in valid for a in axes) or "data" not in axes):
                raise SystemExit(
                    f"--mesh_axes {args.mesh_axes!r}: need {n} distinct "
                    f"names from {valid} including 'data'")
            sections["parallel"]["mesh_axes"] = axes
        else:
            # positional default: data (+ optional spatial for 256px
            # activation sharding); 'model' must be named explicitly
            if n > 2:
                raise SystemExit(
                    "mesh_shape with >2 axes needs --mesh_axes names")
            sections["parallel"]["mesh_axes"] = tuple(
                ["data", "spatial"][:n])
    sections["run"]["isTrain"] = is_train
    if not is_train:
        sections["run"].setdefault("phase", "test")
    return Config(**{k: _SECTION_TYPES[k](**v) for k, v in sections.items()})
