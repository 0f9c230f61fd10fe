"""opt.json run-config layering (SURVEY.md SS2 C3, SS6 config row).

train.py dumps the full Config as opt.json (the reference dumps opt.txt);
checkpoint-CONSUMING CLIs (test.py / evaluate.py, train.py under
--continue_train, tools/export_*) default their STRUCTURAL flags from it so
a saved run restores without retyping its architecture — the failure that
used to surface as an opaque orbax tree-structure mismatch. Explicit flags
always override; --no-from_opt restores the reference's retype-everything
behavior.
"""

from __future__ import annotations

import json
import os

import pytest

from pcgan_tpu.config import (Config, DataConfig, ModelConfig, TrainConfig,
                              load_run_opt, opt_value, parse_config)


def _write_opt(tmp_path, name="run", **overrides):
    cfg = Config(
        data=DataConfig(batch_size=2, crop_size=32, load_size=36,
                        n_age_bins=4, **overrides.pop("data", {})),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          cond_inject="bottleneck", dtype="float32",
                          **overrides.pop("model", {})),
        train=TrainConfig(**overrides.pop("train", {})))
    assert not overrides
    cfg.save(os.path.join(str(tmp_path), name, "opt.json"))
    return cfg


def test_adopts_structural_keys(tmp_path, capsys):
    _write_opt(tmp_path)
    cfg = parse_config(["--name", "run", "--checkpoints_dir", str(tmp_path)],
                       is_train=False, opt_defaults="on")
    assert cfg.model.netG == "resnet_6blocks"
    assert cfg.model.ngf == 8 and cfg.model.ndf == 8
    assert cfg.model.cond_inject == "bottleneck"
    assert cfg.model.dtype == "float32"
    assert cfg.data.crop_size == 32 and cfg.data.load_size == 36
    assert cfg.data.n_age_bins == 4
    # NON-structural keys stay under the caller's control
    assert cfg.data.batch_size == DataConfig.batch_size   # not 2
    out = capsys.readouterr().out
    assert "config: from" in out and "netG='resnet_6blocks'" in out


def test_explicit_flag_overrides_with_note(tmp_path, capsys):
    _write_opt(tmp_path)
    cfg = parse_config(["--name", "run", "--checkpoints_dir", str(tmp_path),
                        "--ngf", "16"],
                       is_train=False, opt_defaults="on")
    assert cfg.model.ngf == 16                 # explicit wins
    assert cfg.model.netG == "resnet_6blocks"  # rest still adopted
    assert "overriding the saved run's opt.json value" in capsys.readouterr().out


def test_no_from_opt_disables(tmp_path):
    _write_opt(tmp_path)
    cfg = parse_config(["--name", "run", "--checkpoints_dir", str(tmp_path),
                        "--no-from_opt"],
                       is_train=False, opt_defaults="on")
    assert cfg.model.netG == ModelConfig.netG
    assert cfg.data.n_age_bins == DataConfig.n_age_bins


def test_resume_mode_gates_on_continue_train(tmp_path):
    _write_opt(tmp_path, train={"ema_decay": 0.999, "skip_nonfinite": 3,
                                "comparator_path": "/x/cmp_latest"})
    common = ["--name", "run", "--checkpoints_dir", str(tmp_path)]
    # a FRESH train run never reads opt.json
    fresh = parse_config(common, is_train=True, opt_defaults="resume")
    assert fresh.model.netG == ModelConfig.netG
    assert fresh.train.ema_decay == 0.0
    # --continue_train adopts structure AND the state-tree togglers
    resumed = parse_config(common + ["--continue_train"],
                           is_train=True, opt_defaults="resume")
    assert resumed.model.netG == "resnet_6blocks"
    assert resumed.train.ema_decay == 0.999
    assert resumed.train.skip_nonfinite == 3
    assert resumed.train.comparator_path == "/x/cmp_latest"
    # the togglers stay CLI-overridable (e.g. deliberately dropping EMA)
    over = parse_config(common + ["--continue_train", "--ema_decay", "0"],
                        is_train=True, opt_defaults="resume")
    assert over.train.ema_decay == 0.0


def test_consume_mode_skips_train_togglers(tmp_path):
    _write_opt(tmp_path, train={"ema_decay": 0.999})
    cfg = parse_config(["--name", "run", "--checkpoints_dir", str(tmp_path)],
                       is_train=False, opt_defaults="on")
    assert cfg.train.ema_decay == 0.0   # test/eval never adopt train keys


def test_from_opt_explicit_requires_file(tmp_path):
    with pytest.raises(SystemExit, match="no readable opt.json"):
        parse_config(["--name", "nope", "--checkpoints_dir", str(tmp_path),
                      "--from_opt"], is_train=False, opt_defaults="on")


def test_missing_or_corrupt_opt_is_silent(tmp_path, capsys):
    # absent file: legacy runs keep today's behavior
    cfg = parse_config(["--name", "ghost", "--checkpoints_dir",
                        str(tmp_path)], is_train=False, opt_defaults="on")
    assert cfg.model.netG == ModelConfig.netG
    # corrupt file: same
    os.makedirs(tmp_path / "bad", exist_ok=True)
    (tmp_path / "bad" / "opt.json").write_text("{not json")
    cfg = parse_config(["--name", "bad", "--checkpoints_dir", str(tmp_path)],
                       is_train=False, opt_defaults="on")
    assert cfg.model.netG == ModelConfig.netG
    assert "config: from" not in capsys.readouterr().out


def test_opt_value_helper(tmp_path):
    _write_opt(tmp_path)
    opt = load_run_opt(str(tmp_path), "run")
    assert opt_value(opt, "model", "netG", "x") == "resnet_6blocks"
    assert opt_value(opt, "model", "nothere", "x") == "x"
    assert opt_value(None, "model", "netG", "x") == "x"


def _save_tiny_run(tmp_path, name="run"):
    """Train-state fixture: a non-default-architecture G-only checkpoint
    plus the opt.json train.py would have written."""
    import jax
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state
    from pcgan_tpu.utils import checkpoint as ckpt
    cfg = _write_opt(tmp_path, name=name)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0),
                               steps_per_epoch=1)
    ckpt.save_generator(state, str(tmp_path), name, wait=True)
    return cfg


@pytest.fixture()
def tiny_run(tmp_path):
    _save_tiny_run(tmp_path)
    return tmp_path


def test_test_cli_restores_without_arch_flags(tiny_run):
    """The headline flow: test.py on a NON-default-architecture run with no
    architecture flags at all — opt.json supplies them (pre-change this
    died in orbax with a tree-structure mismatch)."""
    import test as test_cli
    test_cli.main(["--name", "run", "--checkpoints_dir", str(tiny_run),
                   "--results_dir", str(tiny_run / "res"),
                   "--dataset_mode", "synthetic", "--max_dataset_size", "4",
                   "--num_test", "1", "--batch_size", "1"])
    out_dir = tiny_run / "res" / "run" / "test_latest"
    assert (out_dir / "index.html").is_file()


def test_export_cli_without_arch_flags(tiny_run, tmp_path):
    """tools/export_serving.py with ONLY --name: architecture resolves from
    opt.json and the artifact meta records the adopted values."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "export_serving.py"),
         "--name", "run", "--checkpoints_dir", str(tiny_run),
         "--platforms", "cpu", "--verify",
         "--out_dir", str(tmp_path / "srv")],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "architecture defaults from the run's opt.json" in out.stdout
    meta = json.loads((tmp_path / "srv" / "meta.json").read_text())
    assert meta["netG"] == "resnet_6blocks"
    assert meta["crop_size"] == 32 and meta["n_age_bins"] == 4
