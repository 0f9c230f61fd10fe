"""--g_attn SAGAN self-attention block (models/generator.py SelfAttention):
identity at init (gamma=0), softmax row semantics vs a numpy oracle, global
receptive field, train-step integration, remat composition, unet rejection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.generator import SelfAttention


def _x(seed, n=2, h=8, w=8, c=16):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.normal(0, 1, (n, h, w, c)), jnp.float32)


def test_identity_at_init():
    x = _x(0)
    m = SelfAttention(16)
    v = m.init(jax.random.PRNGKey(0), x)
    assert float(v["params"]["gamma"]) == 0.0
    np.testing.assert_array_equal(np.asarray(m.apply(v, x)), np.asarray(x))


def test_matches_numpy_oracle_with_nonzero_gamma():
    x = _x(1)
    m = SelfAttention(16)
    v = m.init(jax.random.PRNGKey(1), x)
    v = jax.tree.map(lambda a: a, v)
    p = dict(v["params"])
    p["gamma"] = jnp.float32(0.7)
    got = np.asarray(m.apply({"params": p}, x))

    xn = np.asarray(x)
    n, h, w, c = xn.shape

    def conv1x1(name):
        k = np.asarray(p[name]["kernel"]).reshape(
            np.asarray(p[name]["kernel"]).shape[-2:])
        return xn.reshape(-1, c) @ k

    q = conv1x1("theta").reshape(n, h, w, -1)
    k_full = conv1x1("phi").reshape(n, h, w, -1)
    vv_full = conv1x1("g").reshape(n, h, w, -1)

    def pool2(t):
        return t.reshape(n, h // 2, 2, w // 2, 2, t.shape[-1]).max((2, 4))

    kp, vp = pool2(k_full), pool2(vv_full)
    qf = q.reshape(n, h * w, -1)
    kf = kp.reshape(n, -1, kp.shape[-1])
    vf = vp.reshape(n, -1, vp.shape[-1])
    logits = np.einsum("nqc,nkc->nqk", qf, kf)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    o = np.einsum("nqk,nkc->nqc", a, vf).reshape(n, h, w, -1)
    ko = np.asarray(p["o"]["kernel"])
    ko = ko.reshape(ko.shape[-2:])
    want = xn + 0.7 * (o.reshape(-1, o.shape[-1]) @ ko).reshape(n, h, w, c)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_global_receptive_field():
    """With gamma != 0, perturbing ONE far-corner pixel changes the output
    at the opposite corner — the property no 3x3 block has."""
    x = _x(2)
    m = SelfAttention(16)
    v = m.init(jax.random.PRNGKey(2), x)
    p = dict(v["params"])
    p["gamma"] = jnp.float32(1.0)
    y0 = np.asarray(m.apply({"params": p}, x))
    x2 = np.asarray(x).copy()
    x2[:, 0, 0, :] += 3.0
    y1 = np.asarray(m.apply({"params": p}, jnp.asarray(x2)))
    assert np.abs(y1[:, -1, -1, :] - y0[:, -1, -1, :]).max() > 0


def test_rejects_odd_spatial():
    x = jnp.zeros((1, 7, 8, 16))
    with pytest.raises(ValueError, match="even spatial"):
        SelfAttention(16).init(jax.random.PRNGKey(0), x)


def _cfg(**model_kw):
    mk = dict(netG="resnet_6blocks", ngf=8, ndf=8, dtype="float32",
              g_attn=True, cond_inject="bottleneck")
    mk.update(model_kw)
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=32,
                        n_age_bins=4, dataset_mode="synthetic"),
        model=ModelConfig(**mk),
        train=TrainConfig(pool_size=4, lambda_cond=0.0))


def test_train_step_with_attn_runs_and_gamma_moves():
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    assert float(state.g_params["attn"]["gamma"]) == 0.0
    step = jax.jit(make_train_step(cfg, G, D, steps_per_epoch=10))
    r = np.random.default_rng(0)
    batch = {"image": jnp.asarray(r.uniform(-1, 1, (4, 32, 32, 3)),
                                  jnp.float32),
             "bin": jnp.asarray(r.integers(0, 4, (4,), np.int32))}
    for i in range(2):
        state, m = step(state, batch)
        assert all(np.isfinite(float(v)) for v in m.values())
    # gamma received gradient (attention output feeds the loss even at
    # gamma=0: d loss/d gamma = <grad, o> != 0)
    assert float(jnp.abs(state.g_params["attn"]["gamma"])) > 0


def test_attn_composes_with_remat():
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    cfg = _cfg(remat=True)
    G = define_G(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    c = jnp.zeros((1, 4))
    v = init_params(G, jax.random.PRNGKey(0), x, c, train=False)
    out = G.apply(v, x, c, train=False)
    assert out.shape == (1, 32, 32, 3)
    # param names identical with remat off (checkpoint-stable)
    cfg2 = _cfg(remat=False)
    v2 = init_params(define_G(cfg2), jax.random.PRNGKey(0), x, c, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))


def test_unet_rejects_g_attn():
    from pcgan_tpu.models import define_G
    cfg = _cfg(netG="unet_128")
    with pytest.raises(NotImplementedError, match="resnet"):
        define_G(cfg)


# --------------------------------------------------------------------------- #
# --d_attn: the SAGAN block in the PatchGAN discriminator
# --------------------------------------------------------------------------- #


def _d_batch(seed=3, n=2, s=32):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(0, 0.5, (n, s, s, 3)), jnp.float32)
    c = jnp.asarray(np.eye(4, dtype=np.float32)[r.integers(0, 4, (n,))])
    return x, c


def test_d_attn_identity_at_init():
    """gamma=0 -> a d_attn D scores BIT-identically to the plain PatchGAN at
    init (flax derives param rngs per-path, so the shared convs init
    identically with or without the extra attn module)."""
    from pcgan_tpu.models import define_D
    from pcgan_tpu.models.registry import init_params
    x, c = _d_batch()
    outs = {}
    for flag in (False, True):
        cfg = _cfg(g_attn=False, d_attn=flag)
        D = define_D(cfg)
        v = init_params(D, jax.random.PRNGKey(7), x, c, train=False)
        outs[flag] = np.asarray(D.apply(v, x, c, train=False))
    np.testing.assert_array_equal(outs[False], outs[True])


def test_d_attn_train_step_runs_and_gamma_moves():
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg = _cfg(g_attn=False, d_attn=True)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    assert float(state.d_params["attn"]["gamma"]) == 0.0
    step = jax.jit(make_train_step(cfg, G, D, steps_per_epoch=10))
    r = np.random.default_rng(0)
    batch = {"image": jnp.asarray(r.uniform(-1, 1, (4, 32, 32, 3)),
                                  jnp.float32),
             "bin": jnp.asarray(r.integers(0, 4, (4,), np.int32))}
    for _ in range(2):
        state, m = step(state, batch)
        assert all(np.isfinite(float(v)) for v in m.values())
    assert float(jnp.abs(state.d_params["attn"]["gamma"])) > 0


def test_d_attn_composes_with_spectral_norm():
    """SN wraps the attention projections too (SAGAN semantics): u/sigma
    land in batch_stats under the attn path, while the PARAM tree matches
    the non-SN d_attn D (checkpoints cross-load)."""
    from pcgan_tpu.models import define_D
    from pcgan_tpu.models.registry import init_params
    x, c = _d_batch()
    trees = {}
    for sn in (False, True):
        cfg = _cfg(g_attn=False, d_attn=True, spectral_norm=sn)
        D = define_D(cfg)
        v = init_params(D, jax.random.PRNGKey(7), x, c, train=True)
        trees[sn] = v
        out = D.apply(v, x, c, train=False)
        assert np.isfinite(np.asarray(out)).all()
    assert (jax.tree_util.tree_structure(trees[False]["params"])
            == jax.tree_util.tree_structure(trees[True]["params"]))
    bs = trees[True]["batch_stats"]
    assert any("attn" in k for k in bs), sorted(bs)


def test_d_attn_multiscale_runs():
    from pcgan_tpu.models import define_D
    from pcgan_tpu.models.registry import init_params
    x, c = _d_batch(s=32)
    cfg = _cfg(g_attn=False, d_attn=True, netD="multiscale", num_D=2,
               n_layers_D=2)
    D = define_D(cfg)
    v = init_params(D, jax.random.PRNGKey(0), x, c, train=False)
    outs = D.apply(v, x, c, train=False)
    assert isinstance(outs, tuple) and len(outs) == 2
    for k in range(2):
        assert "attn" in v["params"][f"D_{k}"]


def test_pixel_rejects_d_attn():
    from pcgan_tpu.models import define_D
    cfg = _cfg(g_attn=False, d_attn=True, netD="pixel")
    with pytest.raises(NotImplementedError, match="PatchGAN"):
        define_D(cfg)
