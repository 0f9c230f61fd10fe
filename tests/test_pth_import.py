"""End-to-end .pth import parity: a torch pix2pix-template ResnetGenerator's
outputs must match the flax generator per-pixel after import (SURVEY.md SS7
'hard parts' — the BASELINE fidelity target)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import sys, os  # noqa: E402
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from torch_baseline import ResnetG  # noqa: E402  (reference-equivalent torch net)

from pcgan_tpu.config import Config, DataConfig, ModelConfig  # noqa: E402
from pcgan_tpu.models.registry import define_G, init_params  # noqa: E402
from pcgan_tpu.utils.pth_import import (  # noqa: E402
    generator_order, import_generator_pth)


def _convs(order):
    return [o for o in order if o[1] in ("conv", "deconv")]


def _norms(order):
    return [o for o in order if o[1] == "norm"]


def test_resnet_order_lengths():
    assert len(_convs(generator_order("resnet_9blocks"))) == 1 + 2 + 18 + 2 + 1
    assert len(_convs(generator_order("resnet_6blocks"))) == 1 + 2 + 12 + 2 + 1
    assert len(_convs(generator_order("unet_128"))) == 2 * 7
    # norm sites: stem + 2 down + 2/block + 2 up (no norm on the output conv)
    assert len(_norms(generator_order("resnet_6blocks"))) == 1 + 2 + 12 + 2
    # unet_128: down-norms on 5 mid levels + up-norms on all but outermost
    assert len(_norms(generator_order("unet_128"))) == 5 + 6


def test_pth_import_per_pixel_parity(np_rng):
    nb = 4
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6).eval()
    sd = tG.state_dict()

    cfg = Config(data=DataConfig(n_age_bins=nb),
                 model=ModelConfig(netG="resnet_6blocks", ngf=16,
                                   dtype="float32"))
    G = define_G(cfg)
    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[1, 3]]
    variables = init_params(G, jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(cond))
    new_params = import_generator_pth(sd, variables["params"],
                                      "resnet_6blocks")

    out_flax = G.apply({"params": new_params}, jnp.asarray(x),
                       jnp.asarray(cond), train=False)

    with torch.no_grad():
        cmap = torch.from_numpy(cond)[:, :, None, None].expand(-1, -1, 32, 32)
        xin = torch.cat([torch.from_numpy(x.transpose(0, 3, 1, 2)), cmap], 1)
        out_t = tG(xin).numpy().transpose(0, 2, 3, 1)

    # well under one u8 LSB (1/127.5 ~ 7.8e-3): true per-pixel parity
    np.testing.assert_allclose(np.asarray(out_flax), out_t, atol=1e-4)


def test_batchnorm_pth_import_per_pixel_parity(np_rng):
    """--norm batch checkpoints: conv kernels + BN scale/bias/running stats
    all import; eval-mode outputs match torch per-pixel."""
    nb = 4
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6, batchnorm=True)
    # move running stats off their init so the import is actually exercised
    with torch.no_grad():
        tG.train()
        for _ in range(3):
            tG(torch.randn(2, 3 + nb, 32, 32))
        tG.eval()

    cfg = Config(data=DataConfig(n_age_bins=nb),
                 model=ModelConfig(netG="resnet_6blocks", ngf=16,
                                   norm="batch", dtype="float32"))
    G = define_G(cfg)
    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[1, 3]]
    variables = init_params(G, jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(cond))
    new_vars = import_generator_pth(tG.state_dict(), variables,
                                    "resnet_6blocks")
    out_flax = G.apply(new_vars, jnp.asarray(x), jnp.asarray(cond),
                       train=False)
    with torch.no_grad():
        cmap = torch.from_numpy(cond)[:, :, None, None].expand(-1, -1, 32, 32)
        xin = torch.cat([torch.from_numpy(x.transpose(0, 3, 1, 2)), cmap], 1)
        out_t = tG(xin).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_flax), out_t, atol=1e-4)


def test_unet_pth_import_per_pixel_parity(np_rng):
    from torch_baseline import build_unet
    nb = 4
    tG = build_unet(3 + nb, 3, num_downs=5, ngf=8).eval()
    cfg = Config(data=DataConfig(n_age_bins=nb),
                 model=ModelConfig(netG="unet_32", ngf=8, dtype="float32"))
    G = define_G(cfg)
    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[0, 2]]
    variables = init_params(G, jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(cond))
    new_params = import_generator_pth(tG.state_dict(), variables["params"],
                                      "unet_32")
    out_flax = G.apply({"params": new_params}, jnp.asarray(x),
                       jnp.asarray(cond), train=False)
    with torch.no_grad():
        cmap = torch.from_numpy(cond)[:, :, None, None].expand(-1, -1, 32, 32)
        xin = torch.cat([torch.from_numpy(x.transpose(0, 3, 1, 2)), cmap], 1)
        out_t = tG(xin).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_flax), out_t, atol=1e-4)


def test_import_shape_mismatch_raises(np_rng):
    nb = 4
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6).eval()
    cfg = Config(data=DataConfig(n_age_bins=nb),
                 model=ModelConfig(netG="resnet_6blocks", ngf=32,  # wrong ngf
                                   dtype="float32"))
    G = define_G(cfg)
    variables = init_params(G, jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)), jnp.eye(nb)[:1])
    with pytest.raises(ValueError, match="shape mismatch"):
        import_generator_pth(tG.state_dict(), variables["params"],
                             "resnet_6blocks")


def test_import_count_mismatch_raises(np_rng):
    nb = 4
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6).eval()
    cfg = Config(data=DataConfig(n_age_bins=nb),
                 model=ModelConfig(netG="resnet_9blocks", ngf=16,
                                   dtype="float32"))
    G = define_G(cfg)
    variables = init_params(G, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), jnp.eye(nb)[:1])
    with pytest.raises(ValueError, match="count mismatch"):
        import_generator_pth(tG.state_dict(), variables["params"],
                             "resnet_9blocks")
