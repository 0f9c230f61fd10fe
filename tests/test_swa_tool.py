"""tools/average_ckpts.py (offline SWA): exact parameter means across
G-only and full-state tags, EMA-twin averaging, structure-mismatch guard,
and that the written tag loads through the standard G-only restore path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig


def _cfg(**kw):
    return Config(
        data=DataConfig(batch_size=2, crop_size=32, load_size=32,
                        n_age_bins=4, dataset_mode="synthetic"),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=2, lambda_cond=0.0, **kw))


def _state(cfg, seed=0):
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state
    G, D = define_G(cfg), define_D(cfg)
    return create_train_state(cfg, G, D, jax.random.PRNGKey(seed), 10)


def _scale(params, f):
    return jax.tree.map(lambda x: x * f, params)


def test_average_over_full_and_gonly_tags(tmp_path):
    from pcgan_tpu.utils import checkpoint as ckpt
    from tools.average_ckpts import main
    cfg = _cfg()
    s = _state(cfg)
    # epoch_1: full state with params*1; epoch_2_G: G-only with params*3
    ckpt.save(s.replace(g_params=_scale(s.g_params, 1.0)),
              str(tmp_path), "run", "epoch_1", wait=True)
    ckpt.save_generator(s.replace(g_params=_scale(s.g_params, 3.0)),
                        str(tmp_path), "run", "epoch_2", wait=True)
    main(["--checkpoints_dir", str(tmp_path), "--name", "run",
          "--tags", "epoch_1,epoch_2", "--out", "swa"])
    out = ckpt.restore_generator(
        {"params": s.g_params, **s.g_state}, str(tmp_path), "run", "swa")
    want = _scale(s.g_params, 2.0)   # mean of 1x and 3x
    for a, b in zip(jax.tree_util.tree_leaves(out["params"]),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_average_use_ema_twins(tmp_path):
    from pcgan_tpu.utils import checkpoint as ckpt
    from tools.average_ckpts import main
    cfg = _cfg(ema_decay=0.999)
    s = _state(cfg)
    ckpt.save_generator(s.replace(ema_params=_scale(s.g_params, 2.0)),
                        str(tmp_path), "run", "epoch_1", wait=True,
                        use_ema=True)
    ckpt.save(s.replace(ema_params=_scale(s.g_params, 4.0)),
              str(tmp_path), "run", "epoch_2", wait=True)
    main(["--checkpoints_dir", str(tmp_path), "--name", "run",
          "--tags", "epoch_1,epoch_2", "--out", "swa_ema", "--use_ema"])
    out = ckpt.restore_generator(
        {"params": s.g_params, **s.g_state}, str(tmp_path), "run", "swa_ema")
    want = _scale(s.g_params, 3.0)
    for a, b in zip(jax.tree_util.tree_leaves(out["params"]),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_rejects_mismatched_architectures(tmp_path):
    from pcgan_tpu.utils import checkpoint as ckpt
    from tools.average_ckpts import main
    cfg_a = _cfg()
    cfg_b = Config(data=cfg_a.data,
                   model=ModelConfig(netG="resnet_6blocks", ngf=16, ndf=8,
                                     dtype="float32"),
                   train=cfg_a.train)
    ckpt.save_generator(_state(cfg_a), str(tmp_path), "run", "a", wait=True)
    ckpt.save_generator(_state(cfg_b), str(tmp_path), "run", "b", wait=True)
    with pytest.raises(SystemExit, match="structure|average"):
        main(["--checkpoints_dir", str(tmp_path), "--name", "run",
              "--tags", "a,b", "--out", "bad"])


def test_requires_two_tags_and_existing_dirs(tmp_path):
    from tools.average_ckpts import main
    with pytest.raises(SystemExit, match="at least two"):
        main(["--checkpoints_dir", str(tmp_path), "--name", "run",
              "--tags", "only_one"])
    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["--checkpoints_dir", str(tmp_path), "--name", "run",
              "--tags", "nope_1,nope_2"])
