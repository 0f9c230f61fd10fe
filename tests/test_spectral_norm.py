"""Spectral normalization of the discriminator (--spectral_norm).

Beyond-reference opt-in (SN-GAN, Miyato et al. 2018) — SURVEY.md SS2 C7 is
the PatchGAN parity surface; SN is the Lipschitz stabilizer layered on top.
Pins: (1) the D PARAM tree is unchanged by the flag (u/sigma live in
batch_stats -> TrainState.d_state), (2) the power-iteration sigma converges
to the kernel's true largest singular value, (3) the fused and grad-accum
train steps run with SN on and refine the estimates in-step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, replace
from pcgan_tpu.models.registry import define_D, define_G


def _tiny_cfg(**model_kw):
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=36, n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32", **model_kw),
        train=TrainConfig(pool_size=8, lambda_cond=0.0, lambda_L1=10.0))


def test_sn_param_tree_matches_plain(rng):
    """Toggling --spectral_norm must not move any PARAM (checkpoints
    cross-load at the params level); the flag only adds batch_stats."""
    cfg_off = _tiny_cfg()
    cfg_on = _tiny_cfg(spectral_norm=True)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    c = jnp.zeros((2, 4), jnp.float32)
    v_off = define_D(cfg_off).init({"params": rng}, x, c, train=True)
    v_on = define_D(cfg_on).init({"params": rng}, x, c, train=True)
    assert "batch_stats" not in v_off
    assert "batch_stats" in v_on
    paths_off = jax.tree_util.tree_flatten_with_path(v_off["params"])[0]
    paths_on = jax.tree_util.tree_flatten_with_path(v_on["params"])[0]
    assert [p for p, _ in paths_off] == [p for p, _ in paths_on]
    for (_, a), (_, b) in zip(paths_off, paths_on):
        assert a.shape == b.shape
    # every conv kernel got a u/sigma pair
    leaves = jax.tree_util.tree_flatten_with_path(v_on["batch_stats"])[0]
    names = ["/".join(str(k) for k in p) for p, _ in leaves]
    assert any("sigma" in n for n in names) and any("/u" in n or "u'" in n
                                                    for n in names)


def test_sn_sigma_converges_to_svd(rng):
    """The running sigma estimate must approach the kernel's largest
    singular value (torch spectral_norm semantics: matrix = kernel reshaped
    to (prod(others), out))."""
    cfg = _tiny_cfg(spectral_norm=True, netD="pixel")
    D = define_D(cfg)
    x = jax.random.normal(rng, (2, 16, 16, 3), jnp.float32)
    variables = D.init({"params": rng}, x, None, train=True)
    params, bs = variables["params"], variables["batch_stats"]
    for _ in range(50):   # power iteration refines once per training forward
        _, upd = D.apply({"params": params, "batch_stats": bs}, x, None,
                         train=True, mutable=["batch_stats"])
        bs = upd["batch_stats"]
    flat = {"/".join(str(k) for k in p): v for p, v in
            jax.tree_util.tree_flatten_with_path(bs)[0]}
    sig_key = next(k for k in flat if "sigma" in k and "TorchConv_0" in k)
    kernel = params["TorchConv_0"]["kernel"]
    true_sv = np.linalg.svd(
        np.asarray(kernel, np.float64).reshape(-1, kernel.shape[-1]),
        compute_uv=False)[0]
    assert np.isclose(float(flat[sig_key]), true_sv, rtol=1e-3), (
        float(flat[sig_key]), true_sv)


def test_sn_eval_forward_does_not_update_stats(rng):
    cfg = _tiny_cfg(spectral_norm=True)
    D = define_D(cfg)
    x = jax.random.normal(rng, (2, 32, 32, 3), jnp.float32)
    c = jnp.zeros((2, 4), jnp.float32)
    variables = D.init({"params": rng}, x, c, train=True)
    _, upd = D.apply(variables, x, c, train=False, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(upd["batch_stats"]),
                    jax.tree.leaves(variables["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("accum", [1, 2])
def test_sn_train_step_runs_and_refines(rng, accum):
    """Fused (and grad-accum) step with SN on: finite losses, d_state sigma
    moves step-over-step (the in-step power iteration is live)."""
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg = _tiny_cfg(spectral_norm=True)
    cfg = replace(cfg, train=replace(cfg.train, grad_accum=accum))
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, rng, steps_per_epoch=4)
    assert jax.tree.leaves(state.d_state), "SN must populate d_state"
    if accum > 1:
        from pcgan_tpu.accum import make_accum_train_step
        step = jax.jit(make_accum_train_step(cfg, G, D, None, 4))
    else:
        step = jax.jit(make_train_step(cfg, G, D, None, 4))
    batch = {"image": jax.random.uniform(rng, (4, 32, 32, 3), minval=-1.0),
             "bin": jnp.array([0, 1, 2, 3], jnp.int32)}
    sig0 = [np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(state.d_state)[0]
            if "sigma" in "/".join(str(k) for k in p)]
    state, metrics = step(state, batch)
    state, metrics = step(state, batch)
    for v in metrics.values():
        assert np.isfinite(np.asarray(v)).all()
    sig1 = [np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(state.d_state)[0]
            if "sigma" in "/".join(str(k) for k in p)]
    assert any(not np.allclose(a, b) for a, b in zip(sig0, sig1))
