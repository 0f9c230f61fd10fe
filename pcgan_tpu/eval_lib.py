"""Shared FID / condition-accuracy evaluation (SURVEY.md SS6 metrics row;
BASELINE config 5's streaming on-device FID). Used by evaluate.py (offline,
checkpoint-driven) and train.py (periodic in-training eval)."""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcgan_tpu.config import Config
from pcgan_tpu.data.binning import bin_to_onehot
from pcgan_tpu.ops import fid as fid_ops
from pcgan_tpu.ops.preprocess import make_preprocess


def make_fid_evaluator(cfg: Config, G, comparator: Optional[Tuple] = None,
                       mesh=None):
    """Returns f(g_vars, raw_batch_iter, max_images, seed) -> metrics dict.

    raw_batch_iter yields {'image': u8 native, 'bin': int32}. Per batch, one
    jitted program preprocesses (eval transform), generates fakes at permuted
    target bins (matching the real condition marginal), and folds both
    feature sets into device-resident streaming stats. `comparator` is
    (C, c_vars, bin_lo, bin_hi[, bin_means]) for condition accuracy, or None.

    --kid additionally retains the feature rows in device-resident buffers
    and reports kid/kid_std from the same pass (ops/kid.py — the unbiased
    small-sample companion metric). --ssim adds the mean SSIM between each
    input face and its age-translated output (ops/ssim.py — the
    identity-preservation proxy face-aging papers report), accumulated as
    one device scalar over the same pass.

    cond_mode=score: targets are the permuted real bins' score-ladder values
    (so the generated condition marginal still matches the real one), encoded
    through the comparator's bin-mean range when available.

    ``mesh``: a jax.sharding.Mesh with a 'data' axis distributes eval across
    ALL chips (SURVEY.md SS3.2 "psum/all_gather for cross-device metric
    reduction", VERDICT r2 item 4): batches shard along the data axis,
    g_vars/stats stay replicated, and XLA inserts the cross-chip reductions
    when the per-shard feature sums fold into the replicated streaming
    stats — identical math to single-device up to f32 summation order.
    Requires batch_size % mesh.shape['data'] == 0; pass mesh=None (or a
    1-device mesh) for single-chip eval.
    """
    nb = cfg.data.n_age_bins
    score_mode = cfg.model.cond_mode == "score"
    kid_on = cfg.run.kid
    per_bin = cfg.run.fid_per_bin
    prdc_on = cfg.run.prdc
    ssim_on = cfg.run.ssim
    lpips_on = cfg.run.lpips
    lpips_vars = lpips_lins = None
    if lpips_on:
        # --lpips (ops/lpips.py): calibrated perceptual identity drift from
        # the same pass. Trunk + calibration load once, host-side.
        from pcgan_tpu.models.vgg import init_vgg16_vars, load_vgg16_vars
        if cfg.run.lpips_vgg16 == "random":
            lpips_vars = init_vgg16_vars(jax.random.PRNGKey(0))
            print("WARNING: --lpips_vgg16 random — LPIPS runs in FRESH-INIT "
                  "VGG16 feature space (smoke/CI only)", flush=True)
        elif cfg.run.lpips_vgg16:
            lpips_vars = load_vgg16_vars(cfg.run.lpips_vgg16)
        else:
            raise ValueError("--lpips needs --lpips_vgg16 <torchvision "
                             "vgg16 .pth> (or 'random' for a smoke run)")
        if cfg.run.lpips_lins:
            from pcgan_tpu.ops.lpips import load_lpips_lins
            lpips_lins = load_lpips_lins(cfg.run.lpips_lins)
            lpips_key = "lpips"
        else:
            # the uniform fallback is NOT comparable to published LPIPS
            # numbers — report it under its own key so downstream data
            # (metrics.jsonl, compare_runs) can never be misread
            lpips_key = "lpips_uniform"
            print("--lpips: no --lpips_lins given — uniform 1/C channel "
                  "weighting (a valid perceptual distance, NOT the "
                  "published LPIPS calibration); reported as "
                  "'lpips_uniform'", flush=True)
    if per_bin and score_mode:
        raise ValueError("--fid_per_bin needs discrete age bins "
                         "(cond_mode=onehot); score mode has no bins")
    is_on = cfg.run.is_score
    # all of these need raw feature rows kept on device
    retain = kid_on or per_bin or prdc_on or is_on
    feature_fn, d = make_feature_extractor(cfg, comparator)
    is_head = None
    if is_on:
        # --is_score (ops/is_score.py): classifier-head softmax over the
        # retained FAKE features — zero extra forwards. The head must come
        # from the same space the features live in.
        from pcgan_tpu.ops import is_score as is_ops
        spec = cfg.run.fid_features
        if spec.startswith("pth:"):
            is_head = is_ops.load_inception_fc(spec[len("pth:"):])
            if is_head[0].shape[1] != d:
                # both dims are known at startup — fail here, not after the
                # first full eval pass
                raise ValueError(
                    f"--is_score: fc head input dim {is_head[0].shape[1]} "
                    f"!= the feature trunk's {d} (not the matching "
                    f"InceptionV3 checkpoint?)")
        elif spec == "random":
            is_head = is_ops.random_fc(d)
            print("WARNING: --is_score with --fid_features random — seeded "
                  "random classifier head (smoke/CI only, not comparable "
                  "to published IS)", flush=True)
        else:
            raise ValueError(
                "--is_score needs an Inception classifier head: use "
                "--fid_features pth:<inception .pth> (or random for a "
                "smoke run); the comparator trunk has no class labels")
    frozen_real = None
    if cfg.run.fid_stats:
        # --fid_stats: 'fid' is measured against a FROZEN precomputed
        # real-side reference (tools/compute_fid_stats.py) instead of the
        # budget-limited stream; the streamed number stays as 'fid_stream'.
        # KID/PRDC/per-bin keep streamed reals (they need feature ROWS,
        # which a moments file does not carry).
        frozen_real, meta = fid_ops.load_stats(cfg.run.fid_stats)
        if int(frozen_real.s.shape[0]) != d:
            raise ValueError(
                f"--fid_stats {cfg.run.fid_stats}: feature dim "
                f"{int(frozen_real.s.shape[0])} != this run's {d} "
                f"(stats were computed with --fid_features "
                f"{meta.get('fid_features', '?')}, this run uses "
                f"{cfg.run.fid_features})")
        if (meta.get("fid_features") is not None
                and str(meta["fid_features"]) != cfg.run.fid_features):
            raise ValueError(
                f"--fid_stats was computed with --fid_features "
                f"{meta['fid_features']!r}; this run uses "
                f"{cfg.run.fid_features!r} — numbers would be meaningless")
        if (meta.get("crop_size") is not None
                and int(meta["crop_size"]) != cfg.data.crop_size):
            raise ValueError(
                f"--fid_stats was computed at crop_size "
                f"{int(meta['crop_size'])}; this run uses "
                f"{cfg.data.crop_size}")
    pre = make_preprocess(cfg, train=False)
    if mesh is not None and mesh.shape.get("data", 1) <= 1:
        mesh = None
    if mesh is None and jax.process_count() > 1:
        # loaders on pods are process-sharded (make_process_loader), so a
        # mesh-less evaluator would have each host silently compute a
        # partial FID over only its own slice with a per-host image budget
        raise ValueError(
            "multi-process eval requires a mesh with a data axis > 1 "
            "(each host only holds a shard of the eval data)")
    if mesh is not None and cfg.data.batch_size % mesh.shape["data"]:
        raise ValueError(
            f"distributed eval needs --batch_size {cfg.data.batch_size} "
            f"divisible by the mesh data axis ({mesh.shape['data']})")
    bin_means = None
    if comparator is not None:
        # accept host (numpy) snapshots — callers pass device_get copies so
        # donated train-state buffers are never captured
        C, c_vars, lo, hi = comparator[:4]
        if len(comparator) > 4 and comparator[4] is not None:
            bin_means = jnp.asarray(comparator[4])
        comparator = (C, jax.tree.map(jnp.asarray, c_vars),
                      jnp.asarray(lo), jnp.asarray(hi))

    def _constrain_repl(tree):
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P())), tree)

    @jax.jit
    def eval_batch(g_vars, real_u8, bins, perm, r_stats, f_stats, hits, n,
                   bufs, ssim_sum, lpips_sum):
        from pcgan_tpu.data.binning import bin_to_score, normalize_score
        # PRNGKey(0) is deliberate: the eval transform (train=False) is a
        # deterministic center crop with no flip, so the key is never
        # consumed — a fixed key keeps eval bit-reproducible
        batch = pre(jax.random.PRNGKey(0), {"image": real_u8})
        real = batch["image"].astype(jnp.float32)
        target_bin = bins[perm]
        if score_mode:
            if bin_means is not None:
                s = normalize_score(bin_means[target_bin],
                                    bin_means[0], bin_means[-1])
            else:
                s = bin_to_score(target_bin, nb)
            cond = s[:, None]
        else:
            cond = bin_to_onehot(target_bin, nb)
        fake = G.apply(g_vars, real, cond, train=False)
        feats_r, feats_f = feature_fn(real), feature_fn(fake)
        r_stats = fid_ops.update_stats(r_stats, feats_r)
        f_stats = fid_ops.update_stats(f_stats, feats_f)
        if bufs is not None:
            # KID / per-bin FID need the raw feature rows (ops/kid.py,
            # _per_bin_fid): append this batch's features — and each row's
            # real/target bin — to the device-resident buffers at the
            # running row cursor. The buffers are replicated on the mesh,
            # so under distributed eval the sharded feature rows
            # all-gather here — same replication point as the FID stats.
            r_buf, f_buf, rb_buf, fb_buf, cursor = bufs
            z = jnp.int32(0)
            r_buf = jax.lax.dynamic_update_slice(
                r_buf, feats_r.astype(jnp.float32), (cursor, z))
            f_buf = jax.lax.dynamic_update_slice(
                f_buf, feats_f.astype(jnp.float32), (cursor, z))
            if not score_mode:
                rb_buf = jax.lax.dynamic_update_slice(
                    rb_buf, bins.astype(jnp.int32), (cursor,))
                fb_buf = jax.lax.dynamic_update_slice(
                    fb_buf, target_bin.astype(jnp.int32), (cursor,))
            bufs = (r_buf, f_buf, rb_buf, fb_buf,
                    cursor + feats_r.shape[0])
        if comparator is not None:
            C, c_vars, lo, hi = comparator
            mu, _ = C.apply(c_vars, fake, train=False)
            ok = (mu >= lo[target_bin]) & (mu < hi[target_bin])
            hits = hits + jnp.sum(ok)
            n = n + mu.shape[0]
        if ssim_on:
            # identity preservation (--ssim): SSIM between each INPUT face
            # and its age-translated output, from the same pass (ops/ssim.py)
            from pcgan_tpu.ops.ssim import ssim_pair
            ssim_sum = ssim_sum + jnp.sum(
                ssim_pair(real, fake.astype(jnp.float32)))
        if lpips_on:
            # calibrated perceptual identity drift (--lpips, ops/lpips.py):
            # same input/aged pairing as --ssim, same pass
            from pcgan_tpu.ops.lpips import lpips_pair
            lpips_sum = lpips_sum + jnp.sum(
                lpips_pair(lpips_vars, real, fake.astype(jnp.float32),
                           lpips_lins))
        # keep the streaming stats replicated: the per-shard partial sums
        # all-reduce here (the 'psum' of the shard_map design, GSPMD-derived)
        return _constrain_repl((r_stats, f_stats, hits, n, bufs, ssim_sum,
                                lpips_sum))

    def _put_batch(v):
        if isinstance(v, jax.Array):
            # already on device (--device_cache eval batches ride straight
            # from the cache gather): never round-trip through the host;
            # the jitted eval_batch re-lays-out under GSPMD as needed
            return v
        if mesh is None:
            return jnp.asarray(v)
        # host array straight into its sharded placement — no staging
        # round trip (the tunneled-PJRT link makes transfers the eval
        # bottleneck; docs/perf_notes.md r3 attribution)
        from pcgan_tpu.parallel.mesh import put_global_batch
        return put_global_batch({"x": np.asarray(v)}, mesh)["x"]

    def run(g_vars, raw_iter: Iterator[Dict], max_images: int = 512,
            seed: int = 0) -> Dict[str, float]:
        r_stats, f_stats = fid_ops.init_stats(d), fid_ops.init_stats(d)
        hits = jnp.zeros((), jnp.int32)
        n = jnp.zeros((), jnp.int32)
        ssim_sum = jnp.zeros((), jnp.float32)
        lpips_sum = jnp.zeros((), jnp.float32)
        if mesh is not None:
            from pcgan_tpu.parallel.mesh import replicated
            rep = replicated(mesh)
            (g_vars, r_stats, f_stats, hits, n, ssim_sum,
             lpips_sum) = jax.device_put(
                (g_vars, r_stats, f_stats, hits, n, ssim_sum, lpips_sum),
                rep)
        rng = np.random.default_rng(seed)
        # multi-process: each host's loader yields its DISJOINT per-host
        # slice and put_global_batch assembles the global batch, so the
        # global rows consumed per step are local_rows * process_count —
        # count those, keeping max_images a GLOBAL budget
        n_proc = jax.process_count() if mesh is not None else 1
        proc_idx = jax.process_index() if mesh is not None else 0
        if retain and not max_images:
            raise ValueError("--kid/--fid_per_bin/--prdc/--is_score need a "
                             "finite eval budget (max_images > 0) to size "
                             "the feature buffers")
        seen = 0
        bufs = None
        for raw in raw_iter:
            if retain and bufs is None:
                # feature buffers sized once from the first GLOBAL batch:
                # the loop stops after `seen >= max_images`, so the last
                # write starts at most at row max_images - 1
                cap = int(max_images) + raw["image"].shape[0] * n_proc
                bufs = (jnp.zeros((cap, d), jnp.float32),
                        jnp.zeros((cap, d), jnp.float32),
                        jnp.zeros((cap,), jnp.int32),
                        jnp.zeros((cap,), jnp.int32),
                        jnp.zeros((), jnp.int32))
                if mesh is not None:
                    from pcgan_tpu.parallel.mesh import replicated
                    bufs = jax.device_put(bufs, replicated(mesh))
            if bufs is not None and (
                    seen + raw["image"].shape[0] * n_proc > bufs[0].shape[0]):
                # a later batch grew past the first-batch sizing; refusing
                # beats dynamic_update_slice's silent index clamp, which
                # would overwrite earlier feature rows
                raise ValueError(
                    f"eval batch at row {seen} exceeds the KID/per-bin "
                    f"feature buffers ({bufs[0].shape[0]} rows, sized from "
                    f"the first batch); feed fixed-size batches")
            perm = _local_perm_slice(rng, raw["image"].shape[0],
                                     n_proc, proc_idx)
            r_stats, f_stats, hits, n, bufs, ssim_sum, lpips_sum = eval_batch(
                g_vars, _put_batch(raw["image"]), _put_batch(raw["bin"]),
                _put_batch(perm), r_stats, f_stats, hits, n, bufs, ssim_sum,
                lpips_sum)
            seen += int(raw["image"].shape[0]) * n_proc
            if max_images and seen >= max_images:
                break
        # The streamed loop above is the LAST multi-device work. Every
        # carried value is replicated here, and the epilogue metric math
        # (Frechet eigh chain, KID MMD, PRDC k-NN, per-bin FID) runs
        # EAGERLY below — op by op. Running those eager ops on MESH-placed
        # arrays dispatches little multi-device programs whose collectives
        # rendezvous through xla::cpu::InProcessCommunicator on the CPU
        # backend, and on a starved host a participant can miss the
        # rendezvous watchdog (xla::internal::AwaitAndLogIfStuck) and
        # CHECK-ABORT the process. This was the r3→r5 "full-suite SIGABRT
        # inside fid_from_stats" — root-caused this round: NOT eigh/LAPACK
        # and NOT cross-test accumulation; reproduced standalone at ~20%
        # per call on the 1-core CPU-mesh host (native stack in
        # PROGRESS.md r5). Pulling the small replicated carries to host
        # makes the epilogue single-device by construction; numerics are
        # unchanged (same values, same ops, default device).
        (r_stats, f_stats, hits, n, ssim_sum, lpips_sum) = jax.device_get(
            (r_stats, f_stats, hits, n, ssim_sum, lpips_sum))
        if bufs is not None:
            bufs = jax.device_get(bufs)
        if frozen_real is not None:
            out = {"fid": float(fid_ops.fid_from_stats(frozen_real, f_stats)),
                   "fid_stream": float(fid_ops.fid_from_stats(r_stats,
                                                              f_stats)),
                   "fid_stats_images": int(frozen_real.count),
                   "fid_images": seen}
        else:
            out = {"fid": float(fid_ops.fid_from_stats(r_stats, f_stats)),
                   "fid_images": seen}
        if ssim_on and seen:
            out["ssim"] = float(ssim_sum) / seen
        if lpips_on and seen:
            out[lpips_key] = float(lpips_sum) / seen
        if bufs is not None:
            count = min(int(bufs[4]), bufs[0].shape[0])
            if kid_on and count >= 2:
                from pcgan_tpu.ops import kid as kid_ops
                km, ks = kid_ops.kid_from_features(
                    bufs[0][:count], bufs[1][:count],
                    subsets=cfg.run.kid_subsets,
                    subset_size=cfg.run.kid_subset_size, seed=seed)
                out["kid"] = float(km)
                out["kid_std"] = float(ks)
            if per_bin and count >= 2:
                out.update(_per_bin_fid(
                    bufs[0][:count], bufs[2][:count],
                    bufs[1][:count], bufs[3][:count], nb))
            if is_on and count >= 1:
                from pcgan_tpu.ops.is_score import inception_score_from_probs
                w, b = is_head
                probs = jax.nn.softmax(
                    bufs[1][:count] @ jnp.asarray(w).T + jnp.asarray(b),
                    axis=-1)
                m, s = inception_score_from_probs(
                    np.asarray(jax.device_get(probs)),
                    splits=cfg.run.is_splits)
                out["is_mean"], out["is_std"] = m, s
            if prdc_on:
                k = cfg.run.prdc_k
                if count > k:
                    from pcgan_tpu.ops.prdc import prdc_from_features
                    out.update({m: float(v) for m, v in prdc_from_features(
                        bufs[0][:count], bufs[1][:count], k=k).items()})
                else:
                    # degrade like kid/per_bin do (skip, never crash a
                    # training run at its first epoch-end eval); the CLIs
                    # guard their budgets at startup
                    print(f"prdc skipped: {count} eval images <= "
                          f"--prdc_k {k}", flush=True)
        if comparator is not None and int(n) > 0:
            out["cond_accuracy"] = float(hits) / float(n)
        return out

    return run


from functools import partial


@partial(jax.jit, static_argnames=("nb",))
def _per_bin_fid_device(fr, br, ff, bf, nb: int):
    """Module-level jit (a per-call closure would retrace the vmapped
    double-eigh on every eval epoch — jit caches on function identity)."""
    from pcgan_tpu.ops.fid import FIDStats, fid_from_stats

    def stats(f, b):
        oh = jax.nn.one_hot(b, nb, dtype=jnp.float32)        # (n, nb)
        return FIDStats(count=jnp.sum(oh, axis=0),           # (nb,)
                        s=oh.T @ f,                          # (nb, d)
                        ss=jnp.einsum("ni,nd,ne->ide", oh, f, f))

    sr, sf = stats(fr, br), stats(ff, bf)
    fids = jax.vmap(fid_from_stats)(sr, sf)                  # (nb,)
    return fids, sr.count, sf.count


def _per_bin_fid(feats_r, bins_r, feats_f, bins_f, nb: int):
    """Per-age-bin conditional FID (--fid_per_bin): FID between the real
    images OF bin b and the fakes GENERATED AT bin b, for every b — the
    per-age-group quality breakdown face-aging papers report (a model can
    hold a good marginal FID while collapsing one extreme age).

    Static-shape/TPU-friendly: per-bin moment stats via one-hot matmuls
    (no boolean gathers), then fid_from_stats vmapped over the bin axis.
    Bins with fewer than 2 rows on either side are skipped (singular cov).
    Returns {fid_bin_<b>: ...} plus fid_per_bin_mean over computed bins.
    """
    fids, cnt_r, cnt_f = jax.device_get(
        _per_bin_fid_device(feats_r, bins_r, feats_f, bins_f, nb))
    out, vals = {}, []
    for b in range(nb):
        if cnt_r[b] >= 2 and cnt_f[b] >= 2:
            out[f"fid_bin_{b}"] = float(fids[b])
            vals.append(float(fids[b]))
    if vals:
        out["fid_per_bin_mean"] = sum(vals) / len(vals)
    return out


def _local_perm_slice(rng, local_n: int, n_proc: int, proc_idx: int):
    """This host's slice of the GLOBAL target-bin permutation.

    perm indexes the assembled global eval batch (bins[perm] reassigns each
    fake's target bin), so on multi-process pods the values must cover the
    global row range, not [0, local_n): each host permutes its own disjoint
    block (put_global_batch lays host i's rows at [i*local_n, (i+1)*local_n)),
    giving a valid block-diagonal global permutation — marginal preserved,
    target-bin gathers shard-local. Single-process reduces to a plain
    permutation. Every host must consume rng identically (same seed) so
    cross-host rng streams stay aligned batch over batch."""
    return rng.permutation(local_n) + proc_idx * local_n


def make_feature_extractor(cfg: Config, comparator=None):
    """FID feature space dispatch on ``--fid_features`` (SURVEY.md SS6
    metrics row): returns (f(images in [-1,1]) -> (B, d), d).

    random      — fixed-seed conv features (deterministic, in-sandbox only)
    comparator  — pretrained comparator trunk embedding (face-aware; needs
                  --comparator_path)
    pth:<file>  — torchvision/pytorch-fid InceptionV3 import: the only mode
                  whose numbers are comparable to published FID.
    """
    spec = cfg.run.fid_features
    if spec == "random":
        return fid_ops.make_feature_fn(cfg.data.crop_size, cfg.data.output_nc)
    if spec == "comparator":
        if comparator is None:
            raise ValueError("--fid_features comparator requires "
                             "--comparator_path (no comparator loaded)")
        C, c_vars = comparator[0], jax.tree.map(jnp.asarray, comparator[1])

        def f(images):
            return C.apply(c_vars, images, train=False, return_features=True)

        return f, C.nf * 4
    if spec.startswith("pth:"):
        from pcgan_tpu.models.inception import make_inception_feature_fn
        return make_inception_feature_fn(spec[len("pth:"):])
    raise NotImplementedError(f"--fid_features [{spec}] not implemented "
                              f"(want random | comparator | pth:<file>)")


def load_comparator_bundle(cfg: Config):
    """(C, c_vars, bin_lo, bin_hi, bin_means) from cfg.train.comparator_path,
    or None. ``bin_means`` is None for pre-score-mode checkpoints (saved
    before bin means were recorded)."""
    if not cfg.train.comparator_path:
        return None
    import os
    import orbax.checkpoint as ocp
    from pcgan_tpu.models import define_C
    from pcgan_tpu.train import create_comparator_state

    C = define_C(cfg)
    ex = create_comparator_state(cfg, C, jax.random.PRNGKey(0), 1)
    target = {"c_vars": {"params": ex.params, **ex.state},
              "bin_lo": jnp.zeros(cfg.data.n_age_bins),
              "bin_hi": jnp.zeros(cfg.data.n_age_bins),
              "bin_means": jnp.zeros(cfg.data.n_age_bins)}
    c = ocp.StandardCheckpointer()
    path = os.path.abspath(cfg.train.comparator_path)
    try:
        restored = c.restore(
            path, target=jax.tree.map(ocp.utils.to_shape_dtype_struct, target))
    except Exception:
        # older comparator checkpoints predate bin_means
        target.pop("bin_means")
        restored = c.restore(
            path, target=jax.tree.map(ocp.utils.to_shape_dtype_struct, target))
        restored["bin_means"] = None
    return (C, restored["c_vars"], restored["bin_lo"], restored["bin_hi"],
            restored["bin_means"])
