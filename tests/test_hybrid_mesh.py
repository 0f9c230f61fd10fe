"""--dcn_data hybrid ICI x DCN mesh (parallel/mesh.py make_hybrid_mesh):
granule-major data-axis layout (only DP gradient traffic crosses DCN —
SURVEY.md SS3.2's growth path past one slice), loud constructor errors, and
layout-invariance of the GSPMD step on a genuinely permuted device array."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import (Config, DataConfig, ModelConfig, ParallelConfig,
                              TrainConfig)
from pcgan_tpu.parallel.mesh import (make_hybrid_mesh, make_mesh,
                                     mesh_from_config)


def test_layout_granule_major_on_data_axis():
    """2 granules x 4 devices, (4 data, 2 model): data index i lands in
    granule i // 2 (granule-major) and the model axis never crosses a
    granule — per-layer collectives stay on ICI by construction."""
    mesh = make_hybrid_mesh((4, 2), ("data", "model"), dcn_data=2,
                            granule_of=lambda d: d.id % 2)
    dev = mesh.devices
    assert dev.shape == (4, 2) and mesh.axis_names == ("data", "model")
    for i in range(4):
        for j in range(2):
            assert dev[i, j].id % 2 == i // 2, (i, j, dev[i, j].id)
        assert len({d.id % 2 for d in dev[i, :]}) == 1   # model axis: 1 granule


def test_one_d_data_mesh_layout():
    mesh = make_hybrid_mesh((-1,), ("data",), dcn_data=4,
                            granule_of=lambda d: d.id % 4)
    ids = [d.id % 4 for d in mesh.devices]
    assert ids == sorted(ids)                            # granule-major rows


def test_constructor_errors_are_loud():
    with pytest.raises(ValueError, match="divisible"):
        make_hybrid_mesh((4,), ("data",), dcn_data=3,
                         granule_of=lambda d: d.id % 3)
    with pytest.raises(ValueError, match="granule"):
        # single process + no slice metadata -> ONE granule, not two
        make_hybrid_mesh((8,), ("data",), dcn_data=2)
    with pytest.raises(ValueError, match="'data' mesh axis"):
        make_hybrid_mesh((8,), ("model",), dcn_data=2,
                         granule_of=lambda d: d.id % 2)
    with pytest.raises(ValueError, match="granule"):
        # 3 granules found but dcn_data says 2
        make_hybrid_mesh((6,), ("data",), dcn_data=2,
                         devices=jax.devices()[:6],
                         granule_of=lambda d: d.id % 3)


def test_subsets_oversized_granules_like_make_mesh():
    """A mesh smaller than the device count takes the first `per` devices
    of each granule (make_mesh's devices[:n] behavior) instead of erroring;
    too-small granules still fail loudly."""
    mesh = make_hybrid_mesh((4,), ("data",), dcn_data=2,
                            granule_of=lambda d: d.id % 2)
    ids = [d.id for d in mesh.devices.flat]
    assert ids == [0, 2, 1, 3]           # first 2 of granule 0, then of 1
    with pytest.raises(ValueError, match="short"):
        # granules of 4 and 2 devices cannot serve 3 rows each
        make_hybrid_mesh((6,), ("data",), dcn_data=2,
                         devices=jax.devices()[:6],
                         granule_of=lambda d: d.id // 4)


def test_mesh_from_config_dispatch():
    plain = mesh_from_config(ParallelConfig())
    ref = make_mesh((-1,), ("data",))
    assert [d.id for d in plain.devices.flat] == [d.id for d in ref.devices.flat]
    with pytest.raises(ValueError, match="granule"):
        mesh_from_config(ParallelConfig(dcn_data=2))     # 1 process = 1 granule


def _cfg():
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=32,
                        n_age_bins=4, no_flip=True),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=0, lambda_L1=10.0, lambda_cond=0.0))


def test_step_on_permuted_hybrid_mesh_matches_plain():
    """granule_of = id % 2 interleaves granules, so the hybrid device array
    is a REAL permutation of enumeration order — the data x model GSPMD step
    must be layout-invariant (same metrics/params as the plain mesh)."""
    from pcgan_tpu.parallel.auto import (make_auto_train_step,
                                         place_auto_state)
    from pcgan_tpu.train import create_train_state
    from pcgan_tpu.models.registry import define_D, define_G
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.uniform(rng, (4, 32, 32, 3)) * 2 - 1,
        "bin": jnp.arange(4, dtype=jnp.int32) % 4,
        "target_bin": (jnp.arange(4, dtype=jnp.int32) + 1) % 4,
    }
    hybrid = make_hybrid_mesh((4, 2), ("data", "model"), dcn_data=2,
                              granule_of=lambda d: d.id % 2)
    plain = make_mesh((4, 2), ("data", "model"))
    # the permutation is real: [0,2,4,6,1,3,5,7] vs enumeration order
    assert ([d.id for d in hybrid.devices.flat]
            != [d.id for d in plain.devices.flat])
    results = []
    for mesh in (plain, hybrid):
        state = place_auto_state(create_train_state(cfg, G, D, rng, 10), mesh)
        step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                    with_preprocess=False)
        s, m = step(state, batch)
        results.append((jax.device_get(m),
                        jax.device_get(jax.tree_util.tree_leaves(s.g_params)[0])))
    (m1, p1), (m2, p2) = results
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
