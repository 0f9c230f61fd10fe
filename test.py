#!/usr/bin/env python
"""Test / sampling entry point (SURVEY.md SS2 C2, SS4.2 call stack).

Loads a trained checkpoint and writes aging-progression grids
[input | aged@bin0 | ... | aged@binK] as PNGs + an HTML index under
``{results_dir}/{name}/{phase}_{epoch}/`` — the reference's results surface.
All bins render in ONE batched jitted forward per input batch.
"""

from __future__ import annotations

import os


def main(argv=None):
    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    from pcgan_tpu.config import parse_config
    # structural flags (architecture, condition encoding, geometry) default
    # from the run's opt.json so a checkpoint samples without retyping its
    # training flags; explicit flags override (--no-from_opt disables)
    cfg = parse_config(argv, is_train=False, opt_defaults="on")
    from pcgan_tpu.platform import enable_compile_cache
    enable_compile_cache(cfg.run.compile_cache)
    if cfg.data.device_cache or cfg.data.device_cache_sharded:
        # no silently-dead flags (project convention): the cache is a
        # training-loop lever; a single pass over the test set would pay
        # the full upload for one read
        print("note: --device_cache is a training-loop lever; test.py "
              "streams from the host (flag ignored)", flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.data.loader import with_bins
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.ops.preprocess import make_preprocess
    from pcgan_tpu.sample import (aging_grid_visuals, make_anim_sampler,
                                  make_sampler)
    from pcgan_tpu.utils import checkpoint as ckpt
    from pcgan_tpu.utils.visualizer import (HTMLPage, save_animation,
                                            save_visuals_row)

    web_dir = os.path.join(cfg.run.results_dir, cfg.run.name,
                           f"{cfg.run.phase}_{cfg.run.epoch}")
    os.makedirs(web_dir, exist_ok=True)

    G = define_G(cfg)
    s = cfg.data.crop_size
    template = init_params(
        G, jax.random.PRNGKey(0),
        jnp.zeros((1, s, s, cfg.data.input_nc)),
        jnp.zeros((1, cfg.cond_nc)), train=False)
    suffix = "_G_ema" if cfg.run.use_ema else "_G"
    if not ckpt.exists(cfg.run.checkpoints_dir, cfg.run.name,
                       f"{cfg.run.epoch}{suffix}"):
        raise SystemExit(
            f"checkpoint [{cfg.run.epoch}{suffix}] not found under "
            f"{os.path.join(cfg.run.checkpoints_dir, cfg.run.name)} — train "
            f"first (with --ema_decay > 0 for --use_ema) or pass "
            f"--epoch <tag>")
    g_vars = ckpt.restore_generator(template, cfg.run.checkpoints_dir,
                                    cfg.run.name, cfg.run.epoch,
                                    use_ema=cfg.run.use_ema)
    print(f"loaded generator checkpoint [{cfg.run.epoch}{suffix}]",
          flush=True)
    from pcgan_tpu.utils.summary import print_networks
    print_networks({"G": g_vars["params"]}, verbose=cfg.run.verbose)

    ds = data_loader.create_dataset(cfg, train=False)
    bs = min(cfg.data.batch_size, cfg.run.num_test)
    ld = data_loader.Loader(ds, bs, shuffle=False, drop_last=False,
                            num_threads=cfg.data.num_threads,
                            resize_to=data_loader.host_resize_size(cfg))
    pre = make_preprocess(cfg, train=False)   # center crop, no flip
    sampler = make_sampler(cfg, G)
    if cfg.run.anim == 1:
        raise SystemExit("--anim needs >= 2 frames (or 0 to disable)")
    anim_sampler = (make_anim_sampler(cfg, G, cfg.run.anim)
                    if cfg.run.anim > 0 else None)

    page = HTMLPage(web_dir, title=f"{cfg.run.name} [{cfg.run.epoch}]")
    done = 0
    for raw in with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age):
        batch = pre(jax.random.PRNGKey(0),
                    {"image": jnp.asarray(raw["image"])})
        imgs = batch["image"].astype(jnp.float32)
        fakes = sampler(g_vars, imgs)                        # (B, nb, H, W, C)
        fakes = np.asarray(fakes)
        frames = (np.asarray(anim_sampler(g_vars, imgs))     # (B, T, H, W, C)
                  if anim_sampler is not None else None)
        for i in range(imgs.shape[0]):
            if done >= cfg.run.num_test:
                break
            visuals = aging_grid_visuals(cfg, np.asarray(imgs[i]), fakes[i])
            save_visuals_row(page, f"{done:04d}", visuals)
            if frames is not None:
                fn = f"{done:04d}_aging.gif"
                save_animation(frames[i], os.path.join(page.img_dir, fn))
                page.add_images([fn], [f"{cfg.run.anim}-frame sweep"])
            done += 1
        if done >= cfg.run.num_test:
            break
    page.save()
    print(f"wrote {done} aging grids to {web_dir}/index.html", flush=True)


if __name__ == "__main__":
    main()
