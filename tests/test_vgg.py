"""VGG19 perceptual loss (--lambda_vgg, models/vgg.py): tap shapes, the
torchvision-layout .pth import validated per-pixel against a LIVE torch
mirror, pix2pixHD loss semantics, train-step integration in both builders,
and checkpoint-toggle adaptation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.vgg import (TAP_WEIGHTS, import_vgg19_pth,
                                  init_vgg_vars, vgg_perceptual_loss,
                                  vgg_taps)


def test_tap_shapes_and_channels():
    v = init_vgg_vars(jax.random.PRNGKey(0), size=64)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    taps = vgg_taps(v, x)
    assert len(taps) == 5
    chans = [t.shape[-1] for t in taps]
    sizes = [t.shape[1] for t in taps]
    assert chans == [64, 128, 256, 512, 512]
    assert sizes == [64, 32, 16, 8, 4]


def _torch_mirror():
    """torchvision vgg19.features[:30] built from scratch in torch (no
    torchvision in-sandbox); returns (module, state_dict with the
    torchvision 'features.<i>.*' names)."""
    import torch
    from torch import nn as tnn
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512]        # through conv5_1
    layers, in_ch = [], 3
    for c in cfg:
        if c == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, c, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = c
    torch.manual_seed(0)
    net = tnn.Sequential(*layers)
    sd = {f"features.{i}.{k}": v for i, m in enumerate(net)
          for k, v in m.state_dict().items()}
    return net, sd


def test_import_matches_live_torch_mirror():
    import torch
    net, sd = _torch_mirror()
    template = init_vgg_vars(jax.random.PRNGKey(1), size=32)
    params = import_vgg19_pth({k: v.numpy() for k, v in sd.items()},
                              template["params"])
    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(
        np.float32)
    taps = vgg_taps({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        torch_taps, want_idx = [], {1, 6, 11, 20, 29}
        for i, m in enumerate(net):
            t = m(t)
            if i in want_idx:
                torch_taps.append(t.numpy().transpose(0, 2, 3, 1))
    assert len(torch_taps) == 5
    for got, want in zip(taps, torch_taps):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_import_rejects_wrong_layout():
    template = init_vgg_vars(jax.random.PRNGKey(0))
    with pytest.raises(KeyError, match="features.0.weight"):
        import_vgg19_pth({"classifier.0.weight": np.zeros((2, 2))},
                         template["params"])


def test_perceptual_loss_semantics():
    v = init_vgg_vars(jax.random.PRNGKey(2), size=32)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    assert float(vgg_perceptual_loss(v, x, x)) == pytest.approx(0.0, abs=1e-6)
    # matches the hand-computed weighted tap L1
    tx, ty = vgg_taps(v, x), vgg_taps(v, y)
    want = sum(w * float(jnp.mean(jnp.abs(a - b)))
               for w, a, b in zip(TAP_WEIGHTS, tx, ty))
    got = float(vgg_perceptual_loss(v, x, y))
    assert got == pytest.approx(want, rel=1e-4)
    assert got > 0


# --------------------------------------------------------------------------- #
# train-step integration
# --------------------------------------------------------------------------- #


def _cfg(**train_kw):
    kw = dict(pool_size=4, lambda_cond=0.0, lambda_L1=10.0,
              lambda_vgg=5.0, vgg_path="random")
    kw.update(train_kw)
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=32,
                        n_age_bins=4, dataset_mode="synthetic"),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(**kw))


def _batch(seed, cfg):
    r = np.random.default_rng(seed)
    b, s = cfg.data.batch_size, cfg.data.crop_size
    return {"image": jnp.asarray(r.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
            "bin": jnp.asarray(r.integers(0, cfg.data.n_age_bins, (b,),
                                          np.int32))}


def test_create_state_requires_vgg_vars():
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    with pytest.raises(ValueError, match="vgg_path"):
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)


def test_step_with_vgg_loss_runs_and_shapes_training():
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    vv = init_vgg_vars(jax.random.PRNGKey(9), size=cfg.data.crop_size)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10,
                               vgg_vars=vv)
    step = jax.jit(make_train_step(cfg, G, D, steps_per_epoch=10))
    batch = _batch(0, cfg)
    s1, m = step(state, batch)
    assert np.isfinite(float(m["loss_G_vgg"])) and float(m["loss_G_vgg"]) > 0
    # the lever changes G's update (same seed, lambda_vgg off -> different G)
    cfg0 = _cfg(lambda_vgg=0.0, vgg_path="")
    state0 = create_train_state(cfg0, G, D, jax.random.PRNGKey(0), 10)
    step0 = jax.jit(make_train_step(cfg0, G, D, steps_per_epoch=10))
    s0, m0 = step0(state0, batch)
    assert "loss_G_vgg" not in m0
    a = jax.tree_util.tree_leaves(s1.g_params)[0]
    b = jax.tree_util.tree_leaves(s0.g_params)[0]
    assert float(jnp.max(jnp.abs(a - b))) > 0
    # VGG vars stayed frozen
    f0 = jax.tree_util.tree_leaves(state.vgg_vars)[0]
    f1 = jax.tree_util.tree_leaves(s1.vgg_vars)[0]
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_accum_matches_fused_vgg_metric():
    from pcgan_tpu.accum import make_accum_train_step
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg_f = _cfg()
    cfg_a = _cfg(grad_accum=2)
    G, D = define_G(cfg_f), define_D(cfg_f)
    vv = init_vgg_vars(jax.random.PRNGKey(9), size=cfg_f.data.crop_size)
    s0 = create_train_state(cfg_f, G, D, jax.random.PRNGKey(0), 10,
                            vgg_vars=vv)
    batch = _batch(3, cfg_f)
    _, mf = jax.jit(make_train_step(cfg_f, G, D, steps_per_epoch=10))(
        s0, batch)
    _, ma = jax.jit(make_accum_train_step(cfg_a, G, D, steps_per_epoch=10))(
        s0, batch)
    assert float(mf["loss_G_vgg"]) == pytest.approx(
        float(ma["loss_G_vgg"]), rel=1e-4)


def test_ckpt_strips_vgg_and_toggles_cleanly(tmp_path, capsys):
    """Checkpoints never serialize the reconstructible trunk (~43 MB of
    constants): save() strips it to None; the CLI re-attaches on resume
    (restore_state keeps the template's freshly loaded vars). Legacy
    checkpoints that DO carry a trunk still drop it with a notice."""
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state
    from pcgan_tpu.utils import checkpoint as ckpt
    cfg_on = _cfg()
    cfg_off = _cfg(lambda_vgg=0.0, vgg_path="")
    G, D = define_G(cfg_on), define_D(cfg_on)
    vv = init_vgg_vars(jax.random.PRNGKey(9), size=cfg_on.data.crop_size)

    # save WITH vgg: the file carries None; params survive; both resume
    # directions work (off: None; on: freshly loaded vars kept + notice)
    s_on = create_train_state(cfg_on, G, D, jax.random.PRNGKey(0), 10,
                              vgg_vars=vv)
    ckpt.save(s_on, str(tmp_path), "run_a", wait=True)
    s_off = create_train_state(cfg_off, G, D, jax.random.PRNGKey(1), 10)
    restored = ckpt.restore_state(s_off, str(tmp_path), "run_a")
    assert restored.vgg_vars is None
    l0 = jax.tree_util.tree_leaves(s_on.g_params)[0]
    l1 = jax.tree_util.tree_leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    s_on2 = create_train_state(cfg_on, G, D, jax.random.PRNGKey(3), 10,
                               vgg_vars=vv)
    restored2 = ckpt.restore_state(s_on2, str(tmp_path), "run_a")
    f0 = jax.tree_util.tree_leaves(vv)[0]
    f1 = jax.tree_util.tree_leaves(restored2.vgg_vars)[0]
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    assert "freshly loaded" in capsys.readouterr().out
    # ... and save() left the live state untouched
    assert s_on.vgg_vars is not None

    # LEGACY checkpoint that carries a trunk (written via orbax directly,
    # bypassing the strip), resumed without vgg -> dropped with a notice
    import dataclasses
    import orbax.checkpoint as ocp
    legacy = {f.name: getattr(s_on, f.name)
              for f in dataclasses.fields(s_on)}
    c = ocp.StandardCheckpointer()
    import os
    c.save(os.path.join(str(tmp_path), "run_b", "latest"),
           jax.device_get(legacy), force=True)
    c.wait_until_finished()
    s_off2 = create_train_state(cfg_off, G, D, jax.random.PRNGKey(2), 10)
    restored3 = ckpt.restore_state(s_off2, str(tmp_path), "run_b")
    assert restored3.vgg_vars is None
    assert "dropping them" in capsys.readouterr().out
