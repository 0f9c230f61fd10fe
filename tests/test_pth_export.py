"""Flax -> .pth export parity (SURVEY.md SS6 checkpoint row, inverse
direction): exported state_dicts must load into the torch pix2pix-template
mirror and reproduce the flax generator's outputs per-pixel, and must
round-trip through the importer to the identical flax tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import sys, os  # noqa: E402
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from torch_baseline import ResnetG, build_unet  # noqa: E402

from pcgan_tpu.config import Config, DataConfig, ModelConfig  # noqa: E402
from pcgan_tpu.models.registry import define_G, init_params  # noqa: E402
from pcgan_tpu.utils.pth_export import export_generator_pth  # noqa: E402
from pcgan_tpu.utils.pth_import import import_generator_pth  # noqa: E402


def _flax_G(nb=4, netG="resnet_6blocks", ngf=16, norm="instance", seed=7,
            cond_inject="input"):
    cfg = Config(data=DataConfig(n_age_bins=nb),
                 model=ModelConfig(netG=netG, ngf=ngf, norm=norm,
                                   cond_inject=cond_inject,
                                   dtype="float32"))
    G = define_G(cfg)
    variables = init_params(G, jax.random.PRNGKey(seed),
                            jnp.zeros((1, 32, 32, 3)),
                            jnp.zeros((1, nb)), train=False)
    return G, variables


def _torch_out(tG, x, cond):
    with torch.no_grad():
        cmap = torch.from_numpy(cond)[:, :, None, None].expand(
            -1, -1, x.shape[1], x.shape[2])
        xin = torch.cat([torch.from_numpy(x.transpose(0, 3, 1, 2)), cmap], 1)
        return tG(xin).numpy().transpose(0, 2, 3, 1)


def test_export_per_pixel_parity_resnet(np_rng):
    nb = 4
    G, variables = _flax_G(nb)
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6).eval()
    sd = export_generator_pth(variables["params"], "resnet_6blocks",
                              tG.state_dict())
    assert list(sd) == list(tG.state_dict())  # exact template keys, in order
    tG.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[1, 3]]
    out_flax = G.apply({"params": variables["params"]}, jnp.asarray(x),
                       jnp.asarray(cond), train=False)
    np.testing.assert_allclose(np.asarray(out_flax), _torch_out(tG, x, cond),
                               atol=1e-4)


def test_export_per_pixel_parity_resnet_bottleneck(np_rng):
    """The repo's recommended effective-resnet conditioning path exports via
    the extended torch mirror (cond map concat + 1x1 projection at the
    bottleneck)."""
    nb = 4
    G, variables = _flax_G(nb, cond_inject="bottleneck")
    tG = ResnetG(3, 3, ngf=16, n_blocks=6, cond_nc=nb,
                 cond_inject="bottleneck").eval()
    sd = export_generator_pth(variables["params"], "resnet_6blocks",
                              tG.state_dict(), cond_inject="bottleneck")
    assert list(sd) == list(tG.state_dict())
    tG.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[1, 3]]
    out_flax = G.apply({"params": variables["params"]}, jnp.asarray(x),
                       jnp.asarray(cond), train=False)
    with torch.no_grad():
        out_t = tG(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(cond)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_flax), out_t, atol=1e-4)


def test_export_import_roundtrip_identity():
    nb = 4
    _, variables = _flax_G(nb)
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6)
    sd = export_generator_pth(variables["params"], "resnet_6blocks",
                              tG.state_dict())
    back = import_generator_pth(
        {k: torch.from_numpy(v) for k, v in sd.items()},
        variables["params"], "resnet_6blocks")
    orig_leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    back_leaves = jax.tree_util.tree_leaves_with_path(back)
    assert len(orig_leaves) == len(back_leaves)
    for (pa, a), (pb, b) in zip(orig_leaves, back_leaves):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_per_pixel_parity_batchnorm(np_rng):
    nb = 4
    G, variables = _flax_G(nb, norm="batch")
    # move flax batch_stats off init so the export is actually exercised
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.arange(v.size, dtype=np.float32
                                       ).reshape(v.shape) % 0.3
        if v.ndim == 1 else v, variables)
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6, batchnorm=True).eval()
    sd = export_generator_pth(variables, "resnet_6blocks", tG.state_dict())
    tG.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[0, 2]]
    out_flax = G.apply(variables, jnp.asarray(x), jnp.asarray(cond),
                       train=False)
    np.testing.assert_allclose(np.asarray(out_flax), _torch_out(tG, x, cond),
                               atol=1e-4)


def test_export_per_pixel_parity_unet(np_rng):
    nb = 4
    G, variables = _flax_G(nb, netG="unet_32", ngf=8)
    tG = build_unet(3 + nb, 3, num_downs=5, ngf=8).eval()
    sd = export_generator_pth(variables["params"], "unet_32", tG.state_dict())
    tG.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[0, 2]]
    out_flax = G.apply({"params": variables["params"]}, jnp.asarray(x),
                       jnp.asarray(cond), train=False)
    np.testing.assert_allclose(np.asarray(out_flax), _torch_out(tG, x, cond),
                               atol=1e-4)


def test_export_shape_mismatch_raises():
    nb = 4
    _, variables = _flax_G(nb, ngf=16)
    tG = ResnetG(3 + nb, 3, ngf=32, n_blocks=6)  # wrong ngf
    with pytest.raises(ValueError, match="shape mismatch"):
        export_generator_pth(variables["params"], "resnet_6blocks",
                             tG.state_dict())


def test_export_count_mismatch_raises():
    nb = 4
    _, variables = _flax_G(nb)
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=9)  # wrong depth
    with pytest.raises(ValueError, match="count mismatch"):
        export_generator_pth(variables["params"], "resnet_6blocks",
                             tG.state_dict())


def test_export_cli_roundtrip(tmp_path, np_rng):
    """Full flow through the CLIs: save a G-only orbax checkpoint, export it
    with tools/export_pth.py, re-import the .pth with the importer, and check
    per-pixel agreement — the reference user's round trip."""
    nb = 4
    G, variables = _flax_G(nb)
    from pcgan_tpu.utils import checkpoint as ckpt

    class _S:
        g_params = variables["params"]
        g_state = {k: v for k, v in variables.items() if k != "params"}

    ckpt.save_generator(_S, str(tmp_path), "run1", "latest", wait=True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export_pth
    out_file = str(tmp_path / "exported_net_G.pth")
    export_pth.main(["--name", "run1", "--checkpoints_dir", str(tmp_path),
                     "--netG", "resnet_6blocks", "--ngf", "16",
                     "--crop_size", "32", "--n_age_bins", str(nb),
                     "--out", out_file])

    sd = torch.load(out_file, map_location="cpu", weights_only=True)
    tG = ResnetG(3 + nb, 3, ngf=16, n_blocks=6).eval()
    tG.load_state_dict(sd)
    x = (np_rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    cond = np.eye(nb, dtype=np.float32)[[1, 2]]
    out_flax = G.apply({"params": variables["params"]}, jnp.asarray(x),
                       jnp.asarray(cond), train=False)
    np.testing.assert_allclose(np.asarray(out_flax), _torch_out(tG, x, cond),
                               atol=1e-4)
