#!/usr/bin/env python
"""Training entry point (SURVEY.md SS2 C1, SS4.1 call stack).

Reference-compatible surface:
    python train.py --dataroot ./datasets/utkface --name utk128 \
        --model pcgan --load_size 143 --crop_size 128 --batch_size 32 ...

TPU-native internals: one jitted fused G/D step, shard_map DP over a
jax.sharding.Mesh, device-side preprocessing, async orbax checkpoints,
JSONL metrics. `--model comparator` runs comparator pretraining
(SURVEY.md SS4.3) and stores the frozen comparator + bin anchors that
`--model pcgan --comparator_path ...` consumes.
"""

from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    from pcgan_tpu.config import parse_config
    # under --continue_train, structural flags + the state-tree togglers
    # (ema_decay/skip_nonfinite/comparator_path) default from the run's own
    # opt.json — a resume can't silently drop a lever the checkpoint carries
    cfg = parse_config(argv, is_train=True, opt_defaults="resume")
    from pcgan_tpu.platform import enable_compile_cache
    enable_compile_cache(cfg.run.compile_cache)
    if cfg.model.quant_int8:
        # inference-only lever: round() has zero gradient, so a quantized
        # trunk would silently train NOTHING — reject loudly
        raise SystemExit("--quant_int8 is an inference-only lever (test.py/"
                         "export_serving/bench --infer); training through "
                         "int8 quantization has zero gradients")

    import jax
    import jax.numpy as jnp
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.parallel import mesh_from_config
    from pcgan_tpu.utils.metrics import MetricsLogger, StepTimer
    from pcgan_tpu.utils import checkpoint as ckpt

    if cfg.run.debug_nans:
        # numerics sanitizer (SURVEY.md SS6 race/sanitizer row): any NaN
        # produced inside jitted code raises with the offending primitive
        jax.config.update("jax_debug_nans", True)

    if cfg.run.profile_server > 0:
        # live profiling surface (SURVEY.md SS6 tracing row): TensorBoard's
        # profile plugin (or jax.profiler tooling) can capture traces from
        # the RUNNING job on demand — no restart, no fixed window
        jax.profiler.start_server(cfg.run.profile_server)
        print(f"profiler server on :{cfg.run.profile_server} "
              f"(capture via TensorBoard profile plugin)", flush=True)

    run_dir = os.path.join(cfg.run.checkpoints_dir, cfg.run.name)
    os.makedirs(run_dir, exist_ok=True)
    cfg.save(os.path.join(run_dir, "opt.json"))   # reference dumps opt.txt

    mesh = mesh_from_config(cfg.parallel)
    print(f"devices: {mesh.devices.size} ({jax.devices()[0].platform}), mesh "
          f"{dict(zip(mesh.axis_names, mesh.devices.shape))}", flush=True)
    n_data = mesh.shape.get("data", 1)
    if cfg.data.batch_size % n_data:
        raise SystemExit(f"--batch_size {cfg.data.batch_size} must be "
                         f"divisible by the mesh data axis ({n_data})")

    tb_dir = (os.path.join(cfg.run.tb_logdir, cfg.run.name)
              if cfg.run.tb_logdir else "")
    logger = MetricsLogger(run_dir, tb_logdir=tb_dir)
    if cfg.model.model == "comparator":
        # comparator pretraining builds its own PAIRWISE loader (with a
        # held-out split) — see _train_comparator
        if cfg.train.metrics_lag:
            print("--metrics_lag applies to the GAN training loop; "
                  "comparator pretraining prints eagerly (ignored)",
                  flush=True)
        _train_comparator(cfg, mesh, logger, run_dir)
    else:
        ds = data_loader.create_dataset(cfg, train=True)
        # record the RESOLVED split inputs in opt.json: the holdout
        # permutation is a pure function of (len(ds), seed), so evaluate.py
        # can only reproduce it against the same dataset — this record lets
        # it verify that instead of assuming it (ADVICE r4 medium)
        from pcgan_tpu.config import amend_run_opt
        amend_run_opt(cfg.run.checkpoints_dir, cfg.run.name, "split", {
            "dataset_len": len(ds),
            "phase": cfg.run.phase,
            "phase_root": (
                data_loader.phase_root(cfg.data.dataroot, cfg.run.phase)
                if cfg.data.dataset_mode in ("aging", "single") else None),
            "holdout_frac": cfg.data.holdout_frac,
            "seed": cfg.train.seed,
        })
        # --holdout_frac: carve a seeded held-out slice BEFORE any loader /
        # cache sees the dataset — training (and train-split eval) only
        # ever touch the (1-f) remainder; the held-out rows feed a second
        # in-training eval stream (eval_h_* keys) so generalization is
        # measured, not memorization (VERDICT r3 item 3 / weak #2)
        ds, holdout_ds = data_loader.split_holdout(
            ds, cfg.data.holdout_frac, seed=cfg.train.seed)
        if holdout_ds is not None:
            print(f"holdout: {len(holdout_ds)} rows held out "
                  f"({cfg.data.holdout_frac:.0%}), {len(ds)} train rows",
                  flush=True)
        if cfg.data.device_cache or cfg.data.device_cache_sharded:
            # --device_cache: the whole dataset rides to HBM once; epochs
            # gather batches on device (same shuffle seeding as the host
            # Loader, so the sample stream — and exact resume — is
            # unchanged). Eval loaders keep streaming from ld.ds.
            # --device_cache_sharded splits the rows over the data axis
            # (HBM cost / n_data, pod-capable) with a psum_scatter gather.
            from pcgan_tpu.data.device_cache import DeviceCacheLoader
            ld = DeviceCacheLoader(cfg, ds, mesh,
                                   shuffle=not cfg.data.serial_batches,
                                   seed=cfg.train.seed,
                                   sharded=cfg.data.device_cache_sharded)
        else:
            ld = data_loader.make_process_loader(
                cfg, ds, shuffle=not cfg.data.serial_batches,
                seed=cfg.train.seed)
        steps_per_epoch = max(1, len(ld))
        print(f"dataset [{cfg.data.dataset_mode}] size {len(ds)}, "
              f"{steps_per_epoch} steps/epoch", flush=True)
        _train_gan(cfg, mesh, ld, steps_per_epoch, logger, run_dir,
                   holdout_ds=holdout_ds)
    ckpt.wait_all()
    logger.close()


def _epoch_iter(cfg, ld, mesh, skip: int = 0):
    """One epoch of mesh-sharded raw batches, decoded + transferred on a
    background thread so host IO overlaps device compute (SURVEY.md SS4.1:
    the decode path is the reference's throughput ceiling).

    ``skip``: drop the first N batches at the INDEX level (no decode work) —
    exact mid-epoch resume replays the epoch's (seeded) permutation and skips
    the batches the restored step count already consumed."""
    from pcgan_tpu.data.loader import device_prefetch, with_bins
    from pcgan_tpu.parallel.mesh import put_global_batch

    if getattr(ld, "is_device_cache", False):
        # batches come out of an on-device gather, already sharded on the
        # data axis with bins attached — no host decode/transfer/prefetch
        # stage exists on this path (dispatch is async; gathers pipeline
        # with the step)
        ld.skip_next = skip
        return iter(ld)

    def shard_puts(it):
        for b in it:
            yield put_global_batch(b, mesh)

    ld.skip_next = skip
    it = shard_puts(with_bins(iter(ld), cfg.data.n_age_bins,
                              cfg.data.max_age))
    return device_prefetch(it, size=cfg.data.prefetch)


def _train_gan(cfg, mesh, ld, steps_per_epoch, logger, run_dir,
               holdout_ds=None):
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.models import define_C, define_D, define_G
    from pcgan_tpu.parallel import make_parallel_train_step, shard_train_state
    from pcgan_tpu.train import create_train_state, make_lr_schedule
    from pcgan_tpu.utils import checkpoint as ckpt
    from pcgan_tpu.utils.metrics import StepTimer

    G, D = define_G(cfg), define_D(cfg)
    C = c_vars = bin_anchors = None
    # score mode consumes the comparator even at lambda_cond=0: real images
    # are conditioned on their own comparator score (label-free conditioning)
    if cfg.train.comparator_path and (
            cfg.train.lambda_cond > 0 or cfg.model.cond_mode == "score"):
        C = define_C(cfg)
        c_vars, bin_anchors = _load_comparator(cfg)
        print(f"loaded frozen comparator from {cfg.train.comparator_path}",
              flush=True)
    vgg_vars = None
    if cfg.train.lambda_vgg > 0:
        from pcgan_tpu.models.vgg import init_vgg_vars, load_vgg_vars
        if cfg.train.vgg_path == "random":
            vgg_vars = init_vgg_vars(jax.random.PRNGKey(0))
            print("WARNING: --vgg_path random — perceptual loss runs in "
                  "FRESH-INIT VGG feature space (smoke/CI only; point "
                  "--vgg_path at a torchvision vgg19 .pth for the published "
                  "pix2pixHD loss)", flush=True)
        elif cfg.train.vgg_path:
            vgg_vars = load_vgg_vars(cfg.train.vgg_path)
            print(f"loaded VGG19 trunk from {cfg.train.vgg_path}", flush=True)
        # empty path: create_train_state raises with the actionable message

    rng = jax.random.PRNGKey(cfg.train.seed)
    # pool must divide the data axis
    n_dev = mesh.shape["data"]
    pool = cfg.train.pool_size
    if pool > 0 and pool % n_dev:
        pool = ((pool + n_dev - 1) // n_dev) * n_dev
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, pool_size=pool))
    state = create_train_state(cfg, G, D, rng, steps_per_epoch,
                               c_vars=c_vars, bin_anchors=bin_anchors,
                               vgg_vars=vgg_vars)
    from pcgan_tpu.utils.summary import print_networks
    print_networks({"G": state.g_params, "D": state.d_params,
                    "C (frozen)": c_vars["params"] if c_vars else None},
                   verbose=cfg.run.verbose)
    if cfg.train.init_g_from and not cfg.train.continue_train:
        # warm-start G from a G-only checkpoint (e.g. an imported reference
        # .pth, tools/import_pth.py) — fresh D and optimizers
        name, _, tag = cfg.train.init_g_from.rpartition("/")
        gv = ckpt.restore_generator(
            {"params": state.g_params, **state.g_state},
            cfg.run.checkpoints_dir, name or cfg.run.name, tag or "latest")
        g_params = gv["params"]
        g_state = {k: v for k, v in gv.items() if k != "params"}
        state = state.replace(
            g_params=g_params, g_state=g_state,
            ema_params=(jax.tree.map(jnp.copy, g_params)
                        if cfg.train.ema_decay > 0 else None))
        print(f"initialized G from [{cfg.train.init_g_from}]", flush=True)
    epochs_done = resume_skip = 0
    resume_losses = []
    if cfg.train.continue_train and ckpt.exists(
            cfg.run.checkpoints_dir, cfg.run.name, cfg.run.epoch):
        state = ckpt.restore_state(state, cfg.run.checkpoints_dir,
                                   cfg.run.name, cfg.run.epoch)
        # exact host-state resume (SURVEY.md SS6 "resume is exact"): derive
        # the data cursor from the restored step — the loader replays the
        # right epoch's seeded permutation and skips already-consumed
        # batches, so the resumed data order matches the uninterrupted run.
        # (Keep --epoch_count at its ORIGINAL value when resuming; the loop
        # start is derived, not read from the flag.)
        epochs_done = int(state.step) // steps_per_epoch
        resume_skip = int(state.step) % steps_per_epoch
        ld.epoch = epochs_done
        print(f"resumed from step {int(state.step)} (epoch "
              f"{cfg.train.epoch_count + epochs_done}"
              + (f", skipping {resume_skip} consumed batches"
                 if resume_skip else "") + ")", flush=True)
        if resume_skip:
            # mid-epoch resume: re-seed the epoch's loss accumulator from the
            # host sidecar the in-loop latest save wrote, so the plateau
            # scheduler's epoch metric averages the SAME print points the
            # uninterrupted run would have (exact-resume, SURVEY.md SS6)
            resume_losses = _read_host_sidecar(run_dir, int(state.step))
    if cfg.parallel.zero1 or any(
            ax in mesh.axis_names and mesh.shape[ax] > 1
            for ax in ("spatial", "model")):
        # mesh with spatial and/or model axes (or --zero1 optimizer-state
        # sharding): GSPMD-partitioned step (parallel/auto.py) — XLA inserts
        # conv halo exchanges for H-dim activation sharding, the
        # gather/reduce traffic for model-axis (tensor/weight) sharded
        # params+optimizer+EMA, and the ZeRO-1 reduce-scatter/all-gather
        # schedule for data-axis-sharded Adam trees. Pool runs
        # global/replicated on this path.
        from pcgan_tpu.parallel.auto import (make_auto_train_step,
                                             place_auto_state)
        zero1 = cfg.parallel.zero1
        if zero1 and not ("data" in mesh.axis_names
                          and mesh.shape["data"] > 1):
            raise SystemExit("--zero1 needs a mesh data axis > 1 "
                             "(nothing to shard the optimizer over)")
        state = place_auto_state(state, mesh, zero1=zero1)
        step_fn = make_auto_train_step(cfg, G, D, C, steps_per_epoch,
                                       mesh=mesh)
        print("GSPMD step over mesh "
              + "x".join(f"{ax}={mesh.shape[ax]}" for ax in mesh.axis_names)
              + (" + zero1 optimizer sharding" if zero1 else ""),
              flush=True)
    else:
        state = shard_train_state(state, mesh)
        step_fn = make_parallel_train_step(cfg, G, D, C, steps_per_epoch,
                                           mesh=mesh)
    sched = make_lr_schedule(cfg, steps_per_epoch)
    timer = StepTimer()
    total_epochs = cfg.train.niter + cfg.train.niter_decay
    t = cfg.train

    def save_g(state, tag, wait=False):
        """G-only checkpoint; with --ema_decay>0 also writes the {tag}_G_ema
        twin the sampler's --use_ema consumes."""
        ckpt.save_generator(state, cfg.run.checkpoints_dir, cfg.run.name,
                            tag, wait=wait)
        if t.ema_decay > 0:
            ckpt.save_generator(state, cfg.run.checkpoints_dir, cfg.run.name,
                                tag, wait=wait, use_ema=True)
    display = _make_display(cfg, G, run_dir)
    last_latest_save = 0
    profiling = {"active": False, "left": cfg.run.profile_steps, "skip": 3}
    fid_eval = None
    if t.eval_fid_epoch_freq > 0:
        from pcgan_tpu.data.loader import make_process_loader, with_bins
        from pcgan_tpu.eval_lib import make_fid_evaluator
        if (cfg.run.kid or cfg.run.fid_per_bin or cfg.run.prdc
                or cfg.run.is_score) and t.eval_fid_images <= 0:
            # fail at startup, not hours in at the first epoch-end eval
            raise SystemExit(
                "--kid/--fid_per_bin/--prdc/--is_score need a finite "
                "--eval_fid_images budget (>0) to size their feature buffers")
        if cfg.run.prdc and t.eval_fid_images <= cfg.run.prdc_k:
            raise SystemExit(
                f"--prdc needs --eval_fid_images > --prdc_k "
                f"({cfg.run.prdc_k}), got {t.eval_fid_images}")
        if t.eval_use_ema and t.ema_decay <= 0:
            raise SystemExit("--eval_use_ema needs --ema_decay > 0 "
                             "(there is no EMA twin to evaluate)")
        # host snapshots: the train step DONATES its state buffers, so any
        # device array captured here would be deleted after the first step
        cmp_bundle = (C, jax.device_get(c_vars),
                      jax.device_get(state.bin_lo),
                      jax.device_get(state.bin_hi),
                      jax.device_get(bin_anchors[2])
                      if bin_anchors and len(bin_anchors) > 2 else None
                      ) if C else None
        # in-training FID shards across the training mesh's data axis
        # (batch divisibility is already enforced at startup). Multi-process:
        # each host loads a DISJOINT per-host slice (put_global_batch treats
        # each host's batch as its local shard of the global array — same
        # convention as the train loader), so eval rows are not duplicated.
        run_fid = make_fid_evaluator(cfg, G, cmp_bundle, mesh=mesh)
        if getattr(ld, "is_device_cache", False):
            # --device_cache: eval batches ride straight from the resident
            # cache (same deterministic order as the host eval loader) —
            # no per-eval-epoch host decode, no per-batch transfer
            def eval_source():
                return ld.eval_iter()
        else:
            eval_ld = make_process_loader(cfg, ld.ds, shuffle=False)

            def eval_source():
                return with_bins(iter(eval_ld), cfg.data.n_age_bins,
                                 cfg.data.max_age)

        h_eval_source = None
        if holdout_ds is not None:
            # --holdout_frac: a second eval pass over the rows training
            # never saw, streamed from the host (the device cache holds
            # only the train split). eval_h_* lands next to eval_* in
            # metrics.jsonl — the train-vs-held-out gap IS the overfitting
            # signal (VERDICT r3 item 3c).
            h_ld = make_process_loader(cfg, holdout_ds, shuffle=False)
            if len(h_ld) == 0:
                raise SystemExit(
                    f"--holdout_frac {cfg.data.holdout_frac} leaves fewer "
                    f"than one batch ({len(holdout_ds)} rows < "
                    f"--batch_size {cfg.data.batch_size}) for eval")

            def h_eval_source():
                return with_bins(iter(h_ld), cfg.data.n_age_bins,
                                 cfg.data.max_age)

        def fid_eval(state, epoch):
            # --eval_use_ema: score the EMA twin (what ships) instead of
            # the live params; norm running-state collections are shared
            params = (state.ema_params if t.eval_use_ema
                      else state.g_params)
            g_vars = {"params": params, **state.g_state}
            rec = run_fid(
                g_vars, eval_source(),
                max_images=t.eval_fid_images, seed=t.seed)
            out = {("eval_" + k): float(v) for k, v in rec.items()}
            if h_eval_source is not None:
                rec_h = run_fid(g_vars, h_eval_source(),
                                max_images=t.eval_fid_images, seed=t.seed)
                out.update({("eval_h_" + k): float(v)
                            for k, v in rec_h.items()})
            logger.log(int(state.step), out, epoch=epoch)

    plateau = None
    lr_scale = 1.0
    if t.lr_policy == "plateau":
        # metric-driven decay is host-side by design: the jitted step cannot
        # observe logged losses, so the factor rides in as the replicated
        # state.lr_scale scalar (SURVEY.md SS2 C14)
        from pcgan_tpu.train import PlateauScheduler
        plateau = PlateauScheduler()
        # resume restores the full scheduler memory from the checkpointed
        # state — factor AND best/bad_epochs counters, so a run 4 bad-epochs
        # into a 5-patience window stays there after restart
        lr_scale = float(jax.device_get(state.lr_scale))
        plateau.scale = lr_scale
        plateau.best = float(jax.device_get(state.plateau_best))
        plateau.bad_epochs = int(jax.device_get(state.plateau_bad))

    gstep = int(state.step)
    # --metrics_lag: pending (gstep, metrics, epoch) whose device fetch is
    # deferred to the NEXT print point — by then the device has print_freq
    # further steps queued behind it, so the fetch never drains the
    # dispatch pipeline (each print-point device_get otherwise costs ~a
    # step of bubble over tunneled/remote PJRT; docs/perf_notes.md r3
    # "CLI-vs-bench rate attribution"). Values/labels stay exact. The
    # imgs/s column must be measured fetch-to-fetch (each device_get
    # anchors to the FETCHED step's completion): a wall window that ends
    # before a sync would time enqueue speed, not the device.
    pending = None
    lag_anchor = {"t": None, "g": 0}

    mem_dev = jax.devices()[0] if t.log_memory else None

    def _mem_metrics():
        # --log_memory: the PJRT allocator's own occupancy counters — a
        # host-side query (no device work, no sync); {} on backends
        # without memory stats (CPU)
        if mem_dev is None:
            return {}
        try:
            ms = mem_dev.memory_stats() or {}
        except Exception:
            return {}
        out = {}
        if "bytes_in_use" in ms:
            out["mem_hbm_gb"] = round(ms["bytes_in_use"] / 2**30, 3)
        if "peak_bytes_in_use" in ms:
            out["mem_hbm_peak_gb"] = round(ms["peak_bytes_in_use"] / 2**30,
                                           3)
        return out

    def _log_pending():
        nonlocal pending
        g, m, ep = pending
        pending = None
        host_metrics = jax.device_get(m)     # anchors: step g is complete
        now = time.time()
        rate = None
        if lag_anchor["t"] is not None and g > lag_anchor["g"]:
            rate = ((g - lag_anchor["g"]) * cfg.data.batch_size
                    / max(now - lag_anchor["t"], 1e-9))
        lag_anchor.update(t=now, g=g)
        epoch_losses.append(float(host_metrics["loss_G"]))
        logger.log(g, {**{k: float(v) for k, v in host_metrics.items()},
                       **_mem_metrics()},
                   epoch=ep, imgs_per_sec=rate,
                   lr=float(sched(g)) * lr_scale)

    for epoch in range(t.epoch_count + epochs_done, total_epochs + 1):
        epoch_t0 = time.time()
        epoch_losses, resume_losses = resume_losses, []
        metrics = None
        timer.start()
        # epoch top = after boundary ckpt/eval host work: re-anchor the lag
        # window so the epoch's first logged rate measures steps, not the
        # boundary (same semantics as the eager path's timer.start() here)
        lag_anchor.update(t=time.time(), g=gstep)
        for raw in _epoch_iter(cfg, ld, mesh, skip=resume_skip):
            _profile_tick(profiling, run_dir)
            state, metrics = step_fn(state, raw)
            gstep += 1
            timer.tick(cfg.data.batch_size)
            if gstep % t.display_freq == 0:
                display(state, raw, epoch)
            if gstep % t.print_freq == 0:
                if t.metrics_lag:
                    if pending is not None:
                        _log_pending()
                    pending = (gstep, metrics, epoch)
                else:
                    # ONE device_get for all metrics: it both syncs the step
                    # (block_until_ready does not wait under the axon tunnel)
                    # and avoids a host round-trip per scalar
                    host_metrics = jax.device_get(metrics)
                    rate = timer.rate()
                    epoch_losses.append(float(host_metrics["loss_G"]))
                    logger.log(gstep,
                               {**{k: float(v)
                                   for k, v in host_metrics.items()},
                                **_mem_metrics()},
                               epoch=epoch, imgs_per_sec=rate,
                               lr=float(sched(gstep)) * lr_scale)
                    timer.start()
            if t.save_latest_freq > 0 and gstep % t.save_latest_freq == 0:
                # reference semantics: 'latest' every save_latest_freq ITERS,
                # mid-epoch included — with the exact-resume machinery a
                # preemption now loses at most save_latest_freq steps (the
                # resumed run replays the epoch's permutation and skips the
                # consumed batches). Saves snapshot to host then write async,
                # so the device pipeline only pays one sync here.
                if pending is not None:
                    # --metrics_lag: the save + sidecar below must not be
                    # written with the pending point's metrics/loss missing
                    # — a preemption right after would lose that record
                    # forever (resume replays past its step). The save's
                    # own host snapshot syncs the pipeline anyway.
                    _log_pending()
                last_latest_save = gstep
                ckpt.save(state, cfg.run.checkpoints_dir, cfg.run.name,
                          "latest")
                save_g(state, "latest")
                _write_host_sidecar(run_dir, gstep, epoch_losses)
        resume_skip = 0
        if pending is not None:
            # epoch boundary: flush the deferred point so every epoch's
            # metrics.jsonl slice and plateau average stay self-contained
            # (epoch-end checkpoints/eval sync the pipeline anyway)
            _log_pending()
        if plateau is not None and metrics is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            metric = (float(np.mean(epoch_losses)) if epoch_losses
                      else float(jax.device_get(metrics)["loss_G"]))
            new_scale = plateau.update(metric)
            repl = NamedSharding(mesh, P())
            if new_scale != lr_scale:
                lr_scale = new_scale
                state = state.replace(lr_scale=jax.device_put(
                    jnp.float32(lr_scale), repl))
                print(f"plateau: loss_G stalled at {metric:.4f}, lr scale -> "
                      f"{lr_scale:g}", flush=True)
            # persist the scheduler's memory so resume is exact
            state = state.replace(
                plateau_best=jax.device_put(jnp.float32(plateau.best), repl),
                plateau_bad=jax.device_put(jnp.float32(plateau.bad_epochs),
                                           repl))
        # belt for freq boundaries the in-loop modulo cannot hit exactly
        # (steps_per_epoch changes across resumes). save_latest_freq=0 means
        # NO mid-epoch saves but 'latest' still lands at every epoch end (a
        # preemption then loses at most one epoch, not save_epoch_freq of
        # them)
        if (t.save_latest_freq == 0
                and (t.save_epoch_freq <= 0
                     or epoch % t.save_epoch_freq != 0)) or (
                t.save_latest_freq > 0
                and gstep // t.save_latest_freq
                > last_latest_save // t.save_latest_freq):
            last_latest_save = gstep
            ckpt.save(state, cfg.run.checkpoints_dir, cfg.run.name,
                      "latest")
            save_g(state, "latest")
        if t.save_epoch_freq > 0 and epoch % t.save_epoch_freq == 0:
            ckpt.save(state, cfg.run.checkpoints_dir, cfg.run.name,
                      f"epoch_{epoch}")
            save_g(state, f"epoch_{epoch}")
            ckpt.save(state, cfg.run.checkpoints_dir, cfg.run.name, "latest")
            save_g(state, "latest")
            removed = ckpt.prune_epochs(cfg.run.checkpoints_dir, cfg.run.name,
                                        t.max_ckpt_keep)
            if removed:
                print(f"pruned old checkpoints: {removed}", flush=True)
        if fid_eval is not None and epoch % t.eval_fid_epoch_freq == 0:
            fid_eval(state, epoch)
        # static loss curves next to metrics.jsonl (reference: visdom live
        # plots via Visualizer.plot_current_losses; SURVEY.md SS2 C13)
        from pcgan_tpu.utils.loss_plot import write_loss_plot
        write_loss_plot(run_dir)
        print(f"End of epoch {epoch}/{total_epochs} \t "
              f"({time.time() - epoch_t0:.1f}s)", flush=True)
    ckpt.save(state, cfg.run.checkpoints_dir, cfg.run.name, "latest")
    save_g(state, "latest", wait=True)


def _write_host_sidecar(run_dir, step, epoch_losses):
    """Host-only state that rides NEXT TO the mid-epoch 'latest' checkpoint:
    the current epoch's print-point loss list, which the plateau scheduler
    averages at epoch end. Device state lives in the orbax checkpoint; this
    covers the one host accumulator a mid-epoch resume would otherwise
    truncate (the metric would average post-resume points only)."""
    import json
    path = os.path.join(run_dir, "latest_host.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"step": int(step),
                   "epoch_losses": [float(x) for x in epoch_losses]}, f)
    os.replace(tmp, path)   # atomic: a killed write never corrupts the file


def _read_host_sidecar(run_dir, step):
    """Epoch-loss list saved at exactly ``step``, else [] (stale/missing
    sidecars are ignored — the resumed epoch metric just starts fresh)."""
    import json
    path = os.path.join(run_dir, "latest_host.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        if int(rec.get("step", -1)) == int(step):
            return [float(x) for x in rec.get("epoch_losses", [])]
    except (OSError, ValueError, TypeError, AttributeError):
        # any malformed sidecar (non-dict JSON, wrong field types, truncated
        # file) degrades to a fresh epoch metric, never a failed resume
        pass
    return []


def _profile_tick(p, run_dir):
    """--profile_steps N: capture a jax.profiler trace of N steady-state
    steps (skipping the first compile steps) to {run_dir}/trace
    (SURVEY.md SS6 tracing row)."""
    if p["left"] <= 0 and not p["active"]:
        return
    import jax
    if p["skip"] > 0:
        p["skip"] -= 1
        return
    if not p["active"]:
        jax.profiler.start_trace(os.path.join(run_dir, "trace"))
        p["active"] = True
        print(f"profiling {p['left']} steps -> {run_dir}/trace", flush=True)
        return
    p["left"] -= 1
    if p["left"] <= 0:
        jax.profiler.stop_trace()
        p["active"] = False
        print("profile trace written", flush=True)


def _make_display(cfg, G, run_dir):
    """Train-time visual previews (reference Visualizer.display_current_results
    surface, SURVEY.md SS2 C13): every --display_freq steps, render the
    current G on a fixed preview input at every age bin and save a PNG strip
    under {run_dir}/web/images plus an HTML index."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.ops.preprocess import make_preprocess
    from pcgan_tpu.sample import make_sampler
    from pcgan_tpu.utils.visualizer import HTMLPage, save_image, tensor_to_u8

    sampler = make_sampler(cfg, G)
    pre = make_preprocess(cfg, train=False)
    page = HTMLPage(os.path.join(run_dir, "web"), title=cfg.run.name)
    cache = {}

    def display(state, raw, epoch):
        if "preview" not in cache:
            img = raw["image"]
            n = min(2, img.shape[0])
            batch = pre(jax.random.PRNGKey(0), {"image": img[:n]})
            cache["preview"] = batch["image"].astype(jnp.float32)
        real = cache["preview"]
        g_vars = {"params": state.g_params, **state.g_state}
        fakes = np.asarray(sampler(g_vars, real))         # (n, nb, H, W, C)
        n, nb = fakes.shape[:2]
        rows = []
        for i in range(n):
            strip = np.concatenate(
                [np.asarray(real[i])] + [fakes[i, b] for b in range(nb)],
                axis=1)
            rows.append(strip)
        grid = np.concatenate(rows, axis=0)
        fn = f"epoch{epoch:03d}_step{int(state.step):07d}.png"
        save_image(tensor_to_u8(grid), os.path.join(run_dir, "web", "images",
                                                    fn))
        page.add_header(f"epoch {epoch} step {int(state.step)}")
        page.add_images([fn], [fn], width=min(1024, grid.shape[1]))
        page.save()

    return display


def _train_comparator(cfg, mesh, logger, run_dir):
    """Comparator pretraining (SURVEY.md SS4.3) with the same failure-recovery
    story the GAN loop has (SURVEY.md SS6, VERDICT r2 item 5): epoch-cadence
    checkpoints + --continue_train auto-resume (kill -9 loses at most one
    epoch), and pairwise accuracy measured on a HELD-OUT comparison split,
    not on training batches."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.data.loader import with_bins
    from pcgan_tpu.data.pairwise import Subset
    from pcgan_tpu.models import define_C
    from pcgan_tpu.models.comparator import comparison_accuracy
    from pcgan_tpu.parallel import make_parallel_comparator_step
    from pcgan_tpu.train import (compute_bin_anchors, compute_quantile_anchors,
                                 create_comparator_state)
    from pcgan_tpu.utils import checkpoint as ckpt
    from pcgan_tpu.ops.preprocess import make_preprocess

    if cfg.data.dataset_mode == "comparisons":
        # real human annotations (pathA,pathB,label CSV) — keep as requested
        ds = data_loader.create_dataset(cfg, train=True)
    else:
        # age-labeled source: synthesize pairwise labels with a tie threshold
        pair_cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, dataset_mode="pairwise"))
        ds = data_loader.create_dataset(pair_cfg, train=True)

    # held-out split (--cmp_eval_frac, beyond-reference, 0 = strict parity):
    # these pairs are never trained on; epoch-end accuracy on them is the
    # logged out-of-sample eval metric
    n_eval = (int(len(ds) * cfg.train.cmp_eval_frac)
              if len(ds) >= 20 else 0)
    perm = np.random.default_rng(cfg.train.seed + 0x0e7a1).permutation(len(ds))
    eval_ds = Subset(ds, perm[:n_eval]) if n_eval else None
    train_ds = Subset(ds, perm[n_eval:]) if n_eval else ds

    # pod-correct: disjoint per-host pair slices (put_global_batch in
    # _shard_iter assembles the global batch — an unsharded Loader here
    # would duplicate every pair process_count times)
    if cfg.data.device_cache or cfg.data.device_cache_sharded:
        # pairwise batches cache exactly like aging ones (image_a/image_b
        # u8 canvases + labels); the held-out eval and anchor-fitting
        # loaders stay host-side (small, once per epoch / once at the end)
        from pcgan_tpu.data.device_cache import DeviceCacheLoader
        ld = DeviceCacheLoader(cfg, train_ds, mesh, shuffle=True,
                               seed=cfg.train.seed,
                               sharded=cfg.data.device_cache_sharded)
    else:
        ld = data_loader.make_process_loader(cfg, train_ds, shuffle=True,
                                             seed=cfg.train.seed)
    steps_per_epoch = max(1, len(ld))
    print(f"comparator pairs: {len(train_ds)} train / {n_eval} held out, "
          f"{steps_per_epoch} steps/epoch", flush=True)

    C = define_C(cfg)
    state = create_comparator_state(cfg, C, jax.random.PRNGKey(cfg.train.seed),
                                    steps_per_epoch)
    from pcgan_tpu.utils.summary import print_networks
    print_networks({"C": state.params}, verbose=cfg.run.verbose)
    epochs_done = resume_skip = 0
    if cfg.train.continue_train and ckpt.exists(
            cfg.run.checkpoints_dir, cfg.run.name, "cmp_latest"):
        state = ckpt.restore(state, cfg.run.checkpoints_dir, cfg.run.name,
                             "cmp_latest")
        epochs_done = int(state.step) // steps_per_epoch
        resume_skip = int(state.step) % steps_per_epoch
        ld.epoch = epochs_done
        print(f"resumed comparator from step {int(state.step)} (epoch "
              f"{cfg.train.epoch_count + epochs_done})", flush=True)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn = make_parallel_comparator_step(cfg, C, steps_per_epoch, mesh=mesh)

    eval_acc = None
    if eval_ds is not None:
        pre = make_preprocess(cfg, train=False)
        margin = cfg.model.tie_margin

        @jax.jit
        def _eval_batch(params, cstate, a, b, label):
            xa = pre(jax.random.PRNGKey(0), {"image": a})["image"]
            xb = pre(jax.random.PRNGKey(0), {"image": b})["image"]
            bsz = xa.shape[0]
            mu, log_var = C.apply({"params": params, **cstate},
                                  jnp.concatenate([xa, xb], 0), train=False)
            return comparison_accuracy(mu[:bsz], log_var[:bsz], mu[bsz:],
                                       log_var[bsz:], label, margin)

        eval_ld = data_loader.Loader(
            eval_ds, min(cfg.data.batch_size, len(eval_ds)), shuffle=False,
            drop_last=False,   # score EVERY held-out pair, not batch-multiples
            num_threads=cfg.data.num_threads,
            resize_to=data_loader.host_resize_size(cfg))

        def eval_acc(state):
            # weight per-batch means by batch size: drop_last=False leaves a
            # partial final batch, and an unweighted mean would overweight
            # its pairs — the logged metric must be the true PER-PAIR
            # accuracy over the whole held-out split
            hits = total = 0.0
            for r in iter(eval_ld):
                acc = float(jax.device_get(_eval_batch(
                    state.params, state.state, jnp.asarray(r["image_a"]),
                    jnp.asarray(r["image_b"]), jnp.asarray(r["label"]))))
                bsz = r["label"].shape[0]
                hits += acc * bsz
                total += bsz
            return hits / total if total else float("nan")

    total_epochs = cfg.train.niter + cfg.train.niter_decay
    gstep = int(state.step)
    for epoch in range(cfg.train.epoch_count + epochs_done, total_epochs + 1):
        # index-level skip: exact resume without decoding discarded batches
        ld.skip_next, resume_skip = resume_skip, 0
        for raw in (iter(ld) if getattr(ld, "is_device_cache", False)
                    else _shard_iter(iter(ld), mesh)):
            state, metrics = step_fn(state, raw)
            gstep += 1
            if gstep % cfg.train.print_freq == 0:
                logger.log(gstep, {k: float(v) for k, v in metrics.items()},
                           epoch=epoch)
        if eval_acc is not None:
            acc = eval_acc(state)
            logger.log(gstep, {"eval_acc_cmp": acc}, epoch=epoch)
            print(f"comparator held-out accuracy: {acc:.4f}", flush=True)
        # preemption safety: latest every epoch, numbered per cadence
        ckpt.save(state, cfg.run.checkpoints_dir, cfg.run.name, "cmp_latest")
        if cfg.train.save_epoch_freq > 0 and (
                epoch % cfg.train.save_epoch_freq == 0):
            ckpt.save(state, cfg.run.checkpoints_dir, cfg.run.name,
                      f"cmp_epoch_{epoch}")
        print(f"End of comparator epoch {epoch}/{total_epochs}", flush=True)

    # compute score anchors on (a subset of) the underlying images: by age
    # bins when the source has ages, by score quantiles when it is a pure
    # comparisons CSV (no ages anywhere — the paper's label-free setting)
    label_free = hasattr(ds, "image_pool_dataset")
    base = ds.image_pool_dataset() if label_free else ds.base
    n_anchor = min(len(base), 512)
    pre = make_preprocess(cfg, train=False)
    imgs, bins = [], []
    base_it = iter(data_loader.Loader(
        base, min(cfg.data.batch_size, n_anchor), shuffle=False,
        drop_last=False, num_threads=cfg.data.num_threads,
        resize_to=data_loader.host_resize_size(cfg)))
    if not label_free:
        base_it = with_bins(base_it, cfg.data.n_age_bins, cfg.data.max_age)
    seen = 0
    for b in base_it:
        out = pre(jax.random.PRNGKey(0), {"image": jnp.asarray(b["image"])})
        imgs.append(out["image"])
        if not label_free:
            bins.append(jnp.asarray(b["bin"]))
        seen += b["image"].shape[0]
        if seen >= n_anchor:
            break
    imgs = jnp.concatenate(imgs)[:n_anchor]
    c_vars = {"params": state.params, **state.state}
    if label_free:
        lo, hi, means = compute_quantile_anchors(C, c_vars, imgs,
                                                 cfg.data.n_age_bins)
    else:
        bins = jnp.concatenate(bins)[:n_anchor]
        lo, hi, means = compute_bin_anchors(C, c_vars, imgs, bins,
                                            cfg.data.n_age_bins)
    # bin_means carries the score-mode normalization range (--cond_mode score
    # consumes means[0]/means[-1] as the raw comparator-score extremes)
    payload = {"c_vars": c_vars, "bin_lo": lo, "bin_hi": hi,
               "bin_means": means}
    path = ckpt.save(payload, cfg.run.checkpoints_dir, cfg.run.name,
                     "comparator", wait=True)
    print(f"saved comparator + bin anchors to {path}", flush=True)


def _shard_iter(ld, mesh):
    from pcgan_tpu.parallel.mesh import put_global_batch
    for b in iter(ld):
        yield put_global_batch(b, mesh)


def _load_comparator(cfg):
    """comparator_path: checkpoints-style dir saved by `--model comparator`."""
    from pcgan_tpu.eval_lib import load_comparator_bundle
    _, c_vars, lo, hi, means = load_comparator_bundle(cfg)
    return c_vars, (lo, hi, means)


if __name__ == "__main__":
    main()
