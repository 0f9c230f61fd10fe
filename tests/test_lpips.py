"""--lpips perceptual identity drift (ops/lpips.py + models/vgg.py
VGG16Taps): trunk import vs a live torch mirror, an independent torch-side
LPIPS oracle, lin-calibration import semantics, and eval-pass integration
with sharded == single-device equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.models.vgg import (import_vgg16_pth, init_vgg16_vars,
                                  vgg16_taps)
from pcgan_tpu.ops.lpips import (import_lpips_lins, lpips_pair,
                                 uniform_lins, _SCALE, _SHIFT)


def _torch_vgg16_mirror():
    """torchvision vgg16.features[:30] (through relu5_3) built in torch."""
    import torch
    from torch import nn as tnn
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, in_ch = [], 3
    for c in cfg:
        if c == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, c, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = c
    torch.manual_seed(1)
    net = tnn.Sequential(*layers)
    sd = {f"features.{i}.{k}": v for i, m in enumerate(net)
          for k, v in m.state_dict().items()}
    return net, sd


def test_vgg16_import_matches_live_torch_mirror():
    import torch
    net, sd = _torch_vgg16_mirror()
    template = init_vgg16_vars(jax.random.PRNGKey(0), size=32)
    params = import_vgg16_pth({k: v.numpy() for k, v in sd.items()},
                              template["params"])
    x = np.random.default_rng(2).uniform(-1, 1, (2, 32, 32, 3)).astype(
        np.float32)
    taps = vgg16_taps({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        torch_taps, want_idx = [], {3, 8, 15, 22, 29}
        for i, m in enumerate(net):
            t = m(t)
            if i in want_idx:
                torch_taps.append(t.numpy().transpose(0, 2, 3, 1))
    assert len(torch_taps) == 5
    assert [tt.shape[-1] for tt in torch_taps] == [64, 128, 256, 512, 512]
    for got, want in zip(taps, torch_taps):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_lpips_matches_torch_oracle():
    """Independent end-to-end oracle: the full LPIPS pipeline (scaling
    layer, torch trunk, channel-unit normalization, uniform lin weights,
    spatial mean, tap sum) recomputed in torch/numpy."""
    import torch
    net, sd = _torch_vgg16_mirror()
    template = init_vgg16_vars(jax.random.PRNGKey(0), size=32)
    params = import_vgg16_pth({k: v.numpy() for k, v in sd.items()},
                              template["params"])
    r = np.random.default_rng(3)
    x = r.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + r.normal(0, 0.3, x.shape), -1, 1).astype(np.float32)
    got = np.asarray(lpips_pair({"params": params}, jnp.asarray(x),
                                jnp.asarray(y)))

    def taps_np(img):
        xin = (img - np.asarray(_SHIFT, np.float32)) / np.asarray(
            _SCALE, np.float32)
        t = torch.from_numpy(xin.transpose(0, 3, 1, 2))
        out, want_idx = [], {3, 8, 15, 22, 29}
        with torch.no_grad():
            for i, m in enumerate(net):
                t = m(t)
                if i in want_idx:
                    out.append(t.numpy().transpose(0, 2, 3, 1))
        return out

    want = np.zeros(3)
    for tx, ty in zip(taps_np(x), taps_np(y)):
        def norm(t):
            return t / (np.sqrt((t ** 2).sum(-1, keepdims=True)) + 1e-10)
        d2 = (norm(tx) - norm(ty)) ** 2
        want += d2.mean(axis=-1).mean(axis=(1, 2))   # uniform 1/C weights
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    # identical pair -> 0
    same = np.asarray(lpips_pair({"params": params}, jnp.asarray(x),
                                 jnp.asarray(x)))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)


def test_lins_import_clamps_and_validates():
    chans = (64, 128, 256, 512, 512)
    sd = {}
    rngs = np.random.default_rng(4)
    for k, c in enumerate(chans):
        sd[f"lin{k}.model.1.weight"] = rngs.normal(
            0, 1, (1, c, 1, 1)).astype(np.float32)
    lins = import_lpips_lins(sd)
    assert [l.shape[0] for l in lins] == list(chans)
    for k, l in enumerate(lins):   # negative weights clamp to 0
        assert float(jnp.min(l)) >= 0.0
        want = np.maximum(sd[f"lin{k}.model.1.weight"].reshape(-1), 0.0)
        np.testing.assert_allclose(np.asarray(l), want)
    with pytest.raises(KeyError, match="lin0"):
        import_lpips_lins({})
    bad = dict(sd)
    bad["lin2.model.1.weight"] = np.zeros((1, 7, 1, 1), np.float32)
    with pytest.raises(ValueError, match="lin2"):
        import_lpips_lins(bad)
    # uniform fallback shapes
    assert [l.shape[0] for l in uniform_lins()] == list(chans)


def test_eval_lib_reports_lpips_and_shards_match():
    from pcgan_tpu.config import parse_config
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.data.loader import with_bins
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params
    from pcgan_tpu.parallel import make_mesh

    cfg = parse_config([
        "--dataset_mode", "synthetic", "--max_dataset_size", "32",
        "--batch_size", "8", "--crop_size", "32", "--load_size", "36",
        "--dtype", "float32", "--lpips", "--lpips_vgg16", "random"],
        is_train=False)
    ds = data_loader.create_dataset(cfg, train=False)
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, cfg.data.n_age_bins)), train=False)

    def batches():
        ld = data_loader.make_process_loader(cfg, ds, shuffle=False)
        return with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age)

    single = make_fid_evaluator(cfg, G)(g_vars, batches(), max_images=32,
                                        seed=1)
    # no --lpips_lins -> the distinct uncalibrated key, never plain 'lpips'
    assert "lpips_uniform" in single and "lpips" not in single
    assert np.isfinite(single["lpips_uniform"])
    assert single["lpips_uniform"] > 0   # random-init G destroys the input
    mesh = make_mesh((-1,), ("data",))
    if mesh.devices.size > 1:
        sharded = make_fid_evaluator(cfg, G, mesh=mesh)(
            g_vars, batches(), max_images=32, seed=1)
        assert abs(sharded["lpips_uniform"] - single["lpips_uniform"]) < 1e-5


def test_lpips_requires_trunk():
    from pcgan_tpu.config import parse_config
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G
    cfg = parse_config([
        "--dataset_mode", "synthetic", "--batch_size", "4",
        "--crop_size", "32", "--dtype", "float32", "--lpips"],
        is_train=False)
    with pytest.raises(ValueError, match="lpips_vgg16"):
        make_fid_evaluator(cfg, define_G(cfg))
