"""Precomputed FID reference statistics (--fid_stats +
tools/compute_fid_stats.py — the pytorch-fid frozen-stats workflow,
SURVEY.md SS6 metrics row). Frozen stats computed over the SAME images the
evaluator streams must give fid == fid_stream exactly; mismatched feature
spaces / crops must fail loudly."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import parse_config
from pcgan_tpu.data import loader as data_loader
from pcgan_tpu.data.loader import with_bins
from pcgan_tpu.ops import fid as fid_ops


def _cfg(extra=()):
    return parse_config([
        "--dataset_mode", "synthetic", "--max_dataset_size", "32",
        "--batch_size", "8", "--crop_size", "32", "--load_size", "36",
        "--dtype", "float32", *extra], is_train=False)


def test_save_load_roundtrip(tmp_path):
    stats = fid_ops.FIDStats(count=jnp.float32(7.0),
                             s=jnp.arange(4, dtype=jnp.float32),
                             ss=jnp.eye(4, dtype=jnp.float32) * 2)
    path = str(tmp_path / "s.npz")
    fid_ops.save_stats(path, stats, {"fid_features": "random",
                                     "crop_size": 32, "images": 7})
    loaded, meta = fid_ops.load_stats(path)
    assert float(loaded.count) == 7.0
    np.testing.assert_array_equal(np.asarray(loaded.s), np.arange(4))
    assert meta["fid_features"] == "random"
    assert int(meta["crop_size"]) == 32


def _compute_stats(tmp_path, extra=()):
    import tools.compute_fid_stats as tool
    out = str(tmp_path / "stats.npz")
    tool.main(["--dataset_mode", "synthetic", "--max_dataset_size", "32",
               "--batch_size", "8", "--crop_size", "32", "--load_size", "36",
               "--dtype", "float32", "--out", out, *extra])
    return out


def test_frozen_equals_streamed_on_same_data(tmp_path, capsys):
    """Stats file over the full synthetic set + evaluator budget covering
    the same set -> fid (frozen) == fid_stream (same-pass) exactly."""
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params

    out = _compute_stats(tmp_path)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["images"] == 32

    cfg = _cfg(["--fid_stats", out, "--netG", "resnet_6blocks",
                "--ngf", "8", "--ndf", "8"])
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, cfg.data.n_age_bins)), train=False)
    run = make_fid_evaluator(cfg, G)
    ds = data_loader.create_dataset(cfg, train=False)
    ld = data_loader.Loader(ds, cfg.data.batch_size, shuffle=False,
                            drop_last=False)
    res = run(g_vars, with_bins(iter(ld), cfg.data.n_age_bins,
                                cfg.data.max_age), max_images=32, seed=0)
    assert res["fid_stats_images"] == 32
    assert np.isclose(res["fid"], res["fid_stream"], rtol=1e-6, atol=1e-7), res
    assert np.isfinite(res["fid"]) and res["fid"] > 0


def test_frozen_stats_under_sharded_eval(tmp_path):
    """--fid_stats composes with distributed eval: the frozen stats live on
    one device while the streamed fake stats are mesh-replicated — the FID
    must still compute and equal the single-device frozen number."""
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params
    from pcgan_tpu.parallel import make_mesh

    out = _compute_stats(tmp_path)
    cfg = _cfg(["--fid_stats", out, "--netG", "resnet_6blocks",
                "--ngf", "8", "--ndf", "8"])
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, cfg.data.n_age_bins)), train=False)

    def batches():
        ds = data_loader.create_dataset(cfg, train=False)
        ld = data_loader.Loader(ds, cfg.data.batch_size, shuffle=False,
                                drop_last=False)
        return with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age)

    single = make_fid_evaluator(cfg, G)(g_vars, batches(),
                                        max_images=32, seed=0)
    mesh = make_mesh((-1,), ("data",))
    sharded = make_fid_evaluator(cfg, G, mesh=mesh)(g_vars, batches(),
                                                    max_images=32, seed=0)
    assert np.isclose(single["fid"], sharded["fid"], rtol=1e-4), (single,
                                                                  sharded)
    assert sharded["fid_stats_images"] == 32


def test_mismatched_feature_space_rejected(tmp_path):
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G

    out = _compute_stats(tmp_path)
    cfg = _cfg(["--fid_stats", out, "--crop_size", "64", "--load_size", "72"])
    with pytest.raises(ValueError, match="crop_size|feature dim"):
        make_fid_evaluator(cfg, define_G(cfg))


def test_tampered_meta_rejected(tmp_path):
    """Same dim but a different recorded feature space must be refused."""
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G

    out = _compute_stats(tmp_path)
    stats, meta = fid_ops.load_stats(out)
    meta["fid_features"] = "pth:some_inception.pth"
    fid_ops.save_stats(out, stats, meta)
    cfg = _cfg(["--fid_stats", out])
    with pytest.raises(ValueError, match="fid_features"):
        make_fid_evaluator(cfg, define_G(cfg))
