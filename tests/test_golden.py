"""Golden/fidelity tests (SURVEY.md SS5.2): fixed-seed first-step metrics of
the smoke config pinned against stored values; sampler output stability.

Goldens are f32-CPU numbers with a 1e-3 tolerance — tight enough to catch a
semantic change in losses/step wiring, loose enough to survive XLA
fusion-order drift. Regenerate after intentional changes with:
    python -m tests.test_golden regen
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.registry import define_D, define_G
from pcgan_tpu.train import create_train_state, make_train_step

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_step.json")
GOLDEN_SAMPLER_PATH = os.path.join(os.path.dirname(__file__),
                                   "golden_sampler.npz")


def _smoke_cfg():
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=36,
                        n_age_bins=4, no_flip=True),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=8, lambda_L1=50.0, lambda_cond=0.0,
                          seed=0))


def _first_step_metrics():
    cfg = _smoke_cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    k = jax.random.PRNGKey(123)
    batch = {
        "image": jax.random.uniform(k, (4, 32, 32, 3)) * 2 - 1,
        "bin": jnp.array([0, 1, 2, 3], jnp.int32),
        "target_bin": jnp.array([3, 2, 1, 0], jnp.int32),
    }
    _, m = step(state, batch)
    return {k2: float(v) for k2, v in m.items()}


def test_first_step_matches_golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden file missing — run `python -m tests.test_golden regen`")
    golden = json.load(open(GOLDEN_PATH))
    got = _first_step_metrics()
    for k, v in golden.items():
        assert k in got, k
        np.testing.assert_allclose(got[k], v, rtol=1e-3, atol=1e-4,
                                   err_msg=k)


def test_seed_changes_and_determinism():
    a = _first_step_metrics()
    b = _first_step_metrics()
    for k in a:
        assert a[k] == b[k], f"nondeterministic metric {k}"


def _sampler_grid():
    """Fixed-seed init + fixed input -> the full aging grid (SURVEY.md SS5.2:
    'per-pixel parity of the sampler against stored goldens')."""
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.sample import make_sampler
    cfg = _smoke_cfg()
    G = define_G(cfg)
    x = jnp.linspace(-1.0, 1.0, 2 * 32 * 32 * 3,
                     dtype=jnp.float32).reshape(2, 32, 32, 3)
    g_vars = init_params(G, jax.random.PRNGKey(7), x[:1],
                         jnp.zeros((1, cfg.cond_nc)), train=False)
    fakes = make_sampler(cfg, G)(g_vars, x)
    return np.asarray(fakes, np.float32)          # (2, 4, 32, 32, 3)


def test_sampler_matches_stored_golden():
    """Per-pixel parity against the committed golden grid. atol 1e-4 covers
    measured cross-process CPU reduction-order jitter (~3e-5 through the
    tanh head) while catching any semantic change to G, the condition
    encoding, or the sampler batching (those shift pixels by >1e-2)."""
    if not os.path.exists(GOLDEN_SAMPLER_PATH):
        pytest.skip("golden sampler file missing — run "
                    "`python -m tests.test_golden regen`")
    golden = np.load(GOLDEN_SAMPLER_PATH)["fakes"]
    got = _sampler_grid()
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, atol=1e-4, rtol=0)


if __name__ == "__main__":
    import sys
    # the sandbox sitecustomize force-selects the axon TPU; goldens are
    # f32-CPU numbers, so pin the platform the same way conftest does
    from pcgan_tpu.platform import respect_env_platform
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    respect_env_platform()
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        m = _first_step_metrics()
        with open(GOLDEN_PATH, "w") as f:
            json.dump(m, f, indent=2)
        print(f"wrote {GOLDEN_PATH}: {m}")
        np.savez_compressed(GOLDEN_SAMPLER_PATH, fakes=_sampler_grid())
        print(f"wrote {GOLDEN_SAMPLER_PATH}")
