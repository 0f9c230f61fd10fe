"""Shape/dtype tests for every network at multiple resolutions (SURVEY.md SS5.1)."""

import jax
import jax.numpy as jnp
import pytest

from pcgan_tpu.config import Config, DataConfig, ModelConfig, replace
from pcgan_tpu.models.registry import define_C, define_D, define_G, init_params


def _cfg(**model_kw):
    return Config(model=ModelConfig(dtype="float32", **model_kw),
                  data=DataConfig())


@pytest.mark.parametrize("netG,size", [
    ("resnet_9blocks", 64), ("resnet_6blocks", 64),
    ("unet_128", 128), ("resnet_9blocks@resize_conv", 64),
])
def test_generator_shapes(netG, size, rng):
    cfg = _cfg(netG=netG)
    G = define_G(cfg)
    x = jnp.zeros((2, size, size, 3))
    cond = jnp.eye(cfg.data.n_age_bins)[:2]
    variables = init_params(G, rng, x, cond)
    y = G.apply(variables, x, cond, train=False)
    assert y.shape == (2, size, size, 3)
    assert y.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output


@pytest.mark.parametrize("netG,norm,inject,alive", [
    # resnet + IN + input is the ONE mathematically-dead combo (r3 finding:
    # the stem's instance norm subtracts the constant cond map exactly);
    # every other flag combination must carry the condition through.
    ("resnet_6blocks", "instance", "input", False),
    ("resnet_6blocks", "instance", "bottleneck", True),
    ("resnet_6blocks", "batch", "input", True),    # eval-mode BN: running
    ("resnet_6blocks", "batch", "bottleneck", True),  # stats, no cancellation
    ("resnet_6blocks", "none", "input", True),
    ("unet_128", "instance", "input", True),   # LeakyReLU-before-norm + raw
    ("unet_128", "instance", "bottleneck", True),          # skips preserve it
    ("unet_128", "batch", "input", True),
])
def test_cond_sensitivity_matrix(netG, norm, inject, alive, rng):
    """Systematic netG x norm x cond_inject conditioning matrix: asserts for
    EVERY supported flag combination whether the condition actually reaches
    the output (SURVEY.md SS2 C6; r3 IN-cancellation finding). Guards against
    any future layer-ordering change silently killing (or resurrecting)
    conditioning on some path."""
    import warnings as _w
    size = 128 if netG.startswith("unet") else 32
    # the 0.02-std template init attenuates signals geometrically with depth;
    # at ngf=8 the resnet's ALIVE combos measure ~2e-5 (vs ~2e-6 noise floor)
    # — too close to threshold. ngf=16 separates them cleanly (2e-4 vs 3e-6).
    # the unet's skip connections carry an O(1e-1) signal even at ngf=8.
    ngf = 8 if netG.startswith("unet") else 16
    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        cfg = _cfg(netG=netG, norm=norm, cond_inject=inject, ngf=ngf)
        G = define_G(cfg)
    x = jax.random.normal(rng, (1, size, size, 3))
    c0 = jnp.eye(10)[:1]
    c1 = jnp.roll(c0, 5, axis=-1)
    variables = init_params(G, rng, x, c0)
    y0 = G.apply(variables, x, c0, train=False)
    y1 = G.apply(variables, x, c1, train=False)
    sens = float(jnp.max(jnp.abs(y0 - y1)))
    assert (sens > 1e-4) == alive, (
        f"{netG}/{norm}/{inject}: sensitivity {sens:.3g}, expected "
        f"{'alive' if alive else 'dead (IN cancellation)'}")


def test_generator_bottleneck_injection(rng):
    cfg = _cfg(netG="resnet_6blocks", cond_inject="bottleneck")
    G = define_G(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    cond = jnp.eye(cfg.data.n_age_bins)[:1]
    variables = init_params(G, rng, x, cond)
    assert G.apply(variables, x, cond, train=False).shape == (1, 64, 64, 3)


@pytest.mark.parametrize("netD,expect_patch", [
    ("basic", True), ("n_layers", True), ("pixel", False)])
def test_discriminator_shapes(netD, expect_patch, rng):
    cfg = _cfg(netD=netD)
    D = define_D(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    cond = jnp.eye(cfg.data.n_age_bins)[:2]
    variables = init_params(D, rng, x, cond)
    y = D.apply(variables, x, cond, train=False)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    if expect_patch:
        assert 1 < y.shape[1] < 64  # patch logits, downsampled
    else:
        assert y.shape[1] == 64     # per-pixel


def test_patchgan_receptive_field_70px(rng):
    """n_layers=3 'basic' D must see 70x70 patches: a corner-pixel
    perturbation must not touch the far-corner logit. norm='none' — instance
    norm couples outputs through global spatial statistics (true of the
    reference too), so locality is only observable without it."""
    cfg = _cfg(netD="basic", norm="none")
    D = define_D(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = init_params(D, rng, x, None)
    y0 = D.apply(variables, x, None, train=False)
    x2 = x.at[0, 0, 0, :].set(10.0)
    y1 = D.apply(variables, x2, None, train=False)
    diff = jnp.abs(y1 - y0)[0, :, :, 0]
    assert float(diff[0, 0]) > 0          # local logit moves
    assert float(diff[-1, -1]) == 0.0     # far corner out of receptive field


def test_comparator_output(rng):
    cfg = _cfg()
    C = define_C(cfg)
    x = jax.random.normal(rng, (4, 64, 64, 3))
    variables = init_params(C, rng, x)
    mu, log_var = C.apply(variables, x, train=False)
    assert mu.shape == (4,) and log_var.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(mu)))


def test_xavier_init_matches_torch_std(rng):
    """torch xavier_normal_(gain=g): std = g * sqrt(2/(fan_in+fan_out)).

    Regression for ADVICE r1: variance_scaling(fan_avg) already divides by
    (fi+fo)/2, so scale must be g^2 (NOT 2*g^2 — that inflates std sqrt(2)x)."""
    import numpy as np
    from pcgan_tpu.models.layers import make_initializer
    g = 0.02
    fi, fo = 3 * 3 * 64, 3 * 3 * 128   # conv 3x3 64->128 receptive fans
    init = make_initializer("xavier", g)
    w = init(rng, (3, 3, 64, 128), jnp.float32)
    want = g * np.sqrt(2.0 / (fi + fo))
    got = float(jnp.std(w))
    assert abs(got - want) / want < 0.05, (got, want)


def test_bf16_policy_params_stay_f32(rng):
    cfg = Config(model=ModelConfig(dtype="bfloat16", netG="resnet_6blocks"))
    G = define_G(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    cond = jnp.eye(cfg.data.n_age_bins, dtype=jnp.bfloat16)[:1]
    variables = init_params(G, rng, x, cond)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(p.dtype == jnp.float32 for p in leaves)
    y = G.apply(variables, x, cond, train=False)
    assert y.dtype == jnp.float32  # tanh head promoted for stability


def test_generator_lowch_matmul_matches_direct():
    # the s2d tail route (bf16 perf path) must match the direct lowering
    # within bf16 noise, through the real generator wiring
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    from pcgan_tpu.models.registry import define_G, init_params

    def build(lowch):
        cfg = Config(
            data=DataConfig(batch_size=2, crop_size=32, load_size=32,
                            n_age_bins=4),
            model=ModelConfig(netG="resnet_6blocks", ngf=8,
                              dtype="bfloat16", lowch_matmul=lowch))
        return define_G(cfg)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                          jnp.bfloat16)
    cond = jnp.eye(4, dtype=jnp.bfloat16)[:2]
    g_direct, g_s2d = build(False), build(True)
    v = init_params(g_direct, jax.random.PRNGKey(1), x, cond, train=False)
    y0 = np.asarray(g_direct.apply(v, x, cond, train=False), np.float32)
    y1 = np.asarray(g_s2d.apply(v, x, cond, train=False), np.float32)
    assert y0.shape == y1.shape
    np.testing.assert_allclose(y1, y0, rtol=0, atol=3e-2)  # bf16 + tanh


def test_partial_remat_matches_full():
    # remat_blocks is a pure memory/speed dial: outputs and grads must be
    # identical (same math, different recompute schedule)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.models.generator import ResnetGenerator

    def build(remat, nb):
        return ResnetGenerator(output_nc=3, ngf=8, n_blocks=2, remat=remat,
                               remat_blocks=nb, use_dropout=False)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 7))
    cond = jnp.zeros((1, 4))
    g0, g1 = build(False, -1), build(True, 1)
    v = g0.init({"params": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}, x[..., :3], cond,
                train=True)

    def loss(g, v):
        return jnp.sum(g.apply(v, x[..., :3], cond, train=False) ** 2)

    l0, grads0 = jax.value_and_grad(lambda v: loss(g0, v))(v)
    l1, grads1 = jax.value_and_grad(lambda v: loss(g1, v))(v)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads0)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_unet_bottleneck_injection(rng):
    """Unet twin of test_generator_bottleneck_injection (VERDICT r2 item 2):
    cond_inject=bottleneck must actually CONDITION the unet — a silent drop
    trains an unconditional G with healthy-looking losses."""
    cfg = _cfg(netG="unet_128", cond_inject="bottleneck")
    G = define_G(cfg)
    x = jax.random.normal(rng, (1, 128, 128, 3))
    c0 = jnp.eye(cfg.data.n_age_bins)[:1]
    c1 = jnp.roll(c0, 5, axis=-1)
    variables = init_params(G, rng, x, c0)
    y0 = G.apply(variables, x, c0, train=False)
    y1 = G.apply(variables, x, c1, train=False)
    assert y0.shape == (1, 128, 128, 3)
    assert float(jnp.max(jnp.abs(y0 - y1))) > 1e-6


@pytest.mark.parametrize("netG", ["resnet_6blocks", "unet_128"])
def test_invalid_cond_inject_raises(netG, rng):
    cfg = _cfg(netG=netG, cond_inject="bottlneck")  # typo must be LOUD
    G = define_G(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    cond = jnp.eye(cfg.data.n_age_bins)[:1]
    with pytest.raises(NotImplementedError):
        init_params(G, rng, x, cond)


def test_unet_remat_matches_and_keeps_param_names(rng):
    """--remat on the unet is a pure memory dial: identical params tree
    (checkpoint-compatible names) and identical outputs/grads."""
    import numpy as np
    x = jax.random.normal(rng, (1, 128, 128, 3))
    cond = jnp.eye(10)[:1]
    g0 = define_G(_cfg(netG="unet_128"))
    g1 = define_G(_cfg(netG="unet_128", remat=True))
    v = init_params(g0, rng, x, cond)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(init_params(g1, rng, x, cond)))

    def loss(g, v):
        return jnp.sum(g.apply(v, x, cond, train=False) ** 2)

    l0, grads0 = jax.value_and_grad(lambda w: loss(g0, w))(v)
    l1, grads1 = jax.value_and_grad(lambda w: loss(g1, w))(v)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads0)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_print_networks_summary(capsys, rng):
    """--verbose surface (VERDICT r2 item 7): param counts always print;
    verbose adds the per-path parameter table."""
    from pcgan_tpu.utils.summary import count_params, print_networks
    cfg = _cfg(netG="resnet_6blocks", ngf=8)
    G = define_G(cfg)
    v = init_params(G, rng, jnp.zeros((1, 64, 64, 3)),
                    jnp.eye(cfg.data.n_age_bins)[:1])
    n = count_params(v["params"])
    assert n > 1000
    print_networks({"G": v["params"], "C (frozen)": None}, verbose=False)
    out = capsys.readouterr().out
    assert f"{n / 1e6:.3f} M" in out and "Networks initialized" in out
    assert "C (frozen)" not in out        # None nets are skipped
    assert "kernel" not in out            # table only under verbose
    print_networks({"G": v["params"]}, verbose=True)
    out = capsys.readouterr().out
    assert "kernel" in out and "float32" in out


def test_stem_cond_decomposition_matches_concat():
    """bf16 stem path (r3): conv([x ; bcast(cond)]) must equal
    conv(x) + cond@sum_taps(W_cond) — a constant channel through a full
    stride-1 reflect conv is a per-sample bias. Tested in f32 where the
    identity is exact up to summation order."""
    import numpy as np
    from pcgan_tpu.models.generator import broadcast_cond
    from pcgan_tpu.models.layers import TorchConv

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 10))
    conv = TorchConv(8, 7, 1, 3, pad_mode="reflect", use_bias=True)
    xc = jnp.concatenate([x, broadcast_cond(cond, 16, 16)], -1)
    v = conv.init(rng, xc)
    y_concat = conv.apply(v, xc)
    y_split = conv.apply(v, x, cond)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_concat),
                               rtol=1e-4, atol=1e-5)
    # gradients of the FULL kernel (incl. the cond slice) must match too
    def loss(fn_args):
        def f(vv):
            return jnp.sum(conv.apply(vv, *fn_args) ** 2)
        return jax.grad(f)(v)
    g_concat = jax.tree.leaves(loss((xc,)))
    g_split = jax.tree.leaves(loss((x, cond)))
    for a, b in zip(g_split, g_concat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_bf16_generator_stem_split_matches_concat_form(rng):
    """Through the real G wiring: lowch_matmul bf16 (stem split) vs the
    concat lowering on the SAME params stays within bf16 noise."""
    import numpy as np
    from pcgan_tpu.config import Config, DataConfig, ModelConfig

    def build(lowch):
        cfg = Config(
            data=DataConfig(batch_size=2, crop_size=32, load_size=32,
                            n_age_bins=4),
            model=ModelConfig(netG="resnet_6blocks", ngf=8, norm="none",
                              dtype="bfloat16", lowch_matmul=lowch))
        return define_G(cfg)

    x = jax.random.normal(rng, (2, 32, 32, 3), jnp.bfloat16)
    cond = jnp.eye(4, dtype=jnp.bfloat16)[:2]
    g_split, g_concat = build(True), build(False)
    v = init_params(g_concat, jax.random.PRNGKey(1), x, cond, train=False)
    y0 = np.asarray(g_concat.apply(v, x, cond, train=False), np.float32)
    y1 = np.asarray(g_split.apply(v, x, cond, train=False), np.float32)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=3e-2)


def test_instance_norm_cancels_input_injection_resnet(rng):
    """Round-3 finding, pinned: resnet + instance norm + input injection is
    numerically UNCONDITIONAL (the constant cond map is a per-sample bias
    the stem's IN removes exactly); bottleneck injection stays alive. Also
    asserts define_G warns for the dead combination."""
    import warnings as _w
    x = jax.random.normal(rng, (1, 32, 32, 3))
    c0 = jnp.eye(10)[:1]
    c1 = jnp.roll(c0, 5, -1)

    def sensitivity(inject, norm):
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            cfg = _cfg(netG="resnet_6blocks", ngf=16, norm=norm,
                       cond_inject=inject)
            G = define_G(cfg)
        v = init_params(G, rng, x, c0)
        y0 = G.apply(v, x, c0, train=False)
        y1 = G.apply(v, x, c1, train=False)
        return float(jnp.max(jnp.abs(y0 - y1)))

    assert sensitivity("input", "instance") < 1e-4      # dead (float noise)
    assert sensitivity("bottleneck", "instance") > 1e-3  # alive
    with pytest.warns(RuntimeWarning, match="UNCONDITIONAL"):
        define_G(_cfg(netG="resnet_6blocks", norm="instance",
                      cond_inject="input"))


def test_inert_remat_blocks_warns():
    """ADVICE r4 high (generalized): remat_blocks without remat does
    nothing in the generator — setting it must warn instead of silently
    running a no-remat graph the user thinks is block-remat'd."""
    import warnings
    with pytest.warns(RuntimeWarning, match="INERT"):
        define_G(_cfg(netG="resnet_6blocks", cond_inject="bottleneck",
                      remat_blocks=3))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        # with remat on (or the -1 default) there is nothing to warn about
        define_G(_cfg(netG="resnet_6blocks", cond_inject="bottleneck",
                      remat=True, remat_blocks=3))
        define_G(_cfg(netG="resnet_6blocks", cond_inject="bottleneck"))
