"""Full-TRAIN-STEP parity vs a live torch mirror (VERDICT r3 item 2;
SURVEY.md SS4.1 `optimize_parameters` call stack, SS5.2 fidelity tests).

Module-level parity (tests/test_torch_parity.py) and G-forward .pth parity
(tests/test_pth_import.py / test_pth_export.py) pin the NETWORKS; this file
pins the STEP: loss composition, D-then-G sequential ordering (G trains
against the freshly-updated D), detach semantics, the 0.5*(real+fake) D
loss, and Adam's bias-correction/epsilon — the heart of the rebuild — by
running the SAME weights + SAME batch through `make_train_step` and through
an eager torch replica of the reference family's optimize_parameters, in
lockstep for several steps, f32 / Precision.HIGHEST both sides.

Tolerance reasoning: losses are smooth functions of the f32 forward and
agree tightly. Updated PARAMS go through Adam's first step, where
update ~= lr * g/(|g|+eps): entries whose true gradient is ~0 amplify f32
noise into up-to +-lr sign flips, so the param assertion is quantile-based
(bulk must match tightly; the worst entry is bounded by the 2*lr sign-flip
envelope) — the same bound the 2-process topology tests use. The lockstep
LOSS agreement across steps is the binding end-to-end check: it fails if
either stack's updates drift.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from torch_baseline import ResnetG  # noqa: E402

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig  # noqa: E402
from pcgan_tpu.models.registry import define_D, define_G  # noqa: E402
from pcgan_tpu.train import create_train_state, make_train_step  # noqa: E402
from pcgan_tpu.utils.pth_export import export_generator_pth  # noqa: E402

NB = 4          # age bins
S = 32          # crop
B = 4           # batch
NGF = NDF = 16
LR = 2e-4


def _cfg(cond_inject):
    return Config(
        data=DataConfig(batch_size=B, crop_size=S, load_size=S,
                        n_age_bins=NB),
        model=ModelConfig(netG="resnet_6blocks", netD="basic", ngf=NGF,
                          ndf=NDF, dtype="float32",
                          cond_inject=cond_inject),
        train=TrainConfig(gan_mode="lsgan", lambda_L1=100.0,
                          lambda_cond=0.0, pool_size=0,
                          lr=LR, lr_policy="constant"))


class TorchPatchD(tnn.Module):
    """Exact torch twin of models/discriminator.py NLayerDiscriminator
    (basic, n_layers=3, instance norm): mid convs carry NO bias — the flax
    side drops them as forward-inert under affine-free IN (layers.py
    conv_bias_before_norm), and a zero bias with an identically-zero
    gradient stays zero under Adam, so the twin omits them outright."""

    def __init__(self, in_nc, ndf):
        super().__init__()
        self.c0 = tnn.Conv2d(in_nc, ndf, 4, 2, 1)
        self.c1 = tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False)
        self.c2 = tnn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False)
        self.c3 = tnn.Conv2d(ndf * 4, ndf * 8, 4, 1, 1, bias=False)
        self.c4 = tnn.Conv2d(ndf * 8, 1, 4, 1, 1)
        self.n1 = tnn.InstanceNorm2d(ndf * 2)
        self.n2 = tnn.InstanceNorm2d(ndf * 4)
        self.n3 = tnn.InstanceNorm2d(ndf * 8)

    def forward(self, x):
        h = F.leaky_relu(self.c0(x), 0.2)
        h = F.leaky_relu(self.n1(self.c1(h)), 0.2)
        h = F.leaky_relu(self.n2(self.c2(h)), 0.2)
        h = F.leaky_relu(self.n3(self.c3(h)), 0.2)
        return self.c4(h)


def _copy_d_params(d_params, tD):
    """flax NLayerDiscriminator params -> TorchPatchD, kernel HWIO->OIHW."""
    convs = [tD.c0, tD.c1, tD.c2, tD.c3, tD.c4]
    with torch.no_grad():
        for i, conv in enumerate(convs):
            leaf = d_params[f"TorchConv_{i}"]
            conv.weight.copy_(torch.from_numpy(
                np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1).copy()))
            if conv.bias is not None:
                conv.bias.copy_(torch.from_numpy(np.asarray(leaf["bias"])))


def _batches(n_steps, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        out.append({
            "image": (rng.random((B, S, S, 3), np.float32) * 2 - 1),
            "bin": rng.integers(0, NB, B).astype(np.int64),
            "target_bin": rng.integers(0, NB, B).astype(np.int64),
        })
    return out


def _cmap(bins):
    c = torch.eye(NB)[torch.from_numpy(bins)]
    return c, c[:, :, None, None].expand(-1, -1, S, S)


def _torch_step(tG, tD, opt_g, opt_d, batch, cond_inject):
    """One reference-semantics step (SURVEY.md SS4.1): forward -> D
    backward+step on the detached fake -> G backward+step vs the UPDATED D,
    L_D = 0.5*(lsgan(D(real),1)+lsgan(D(fake),0)),
    L_G = lsgan(D(fake),1) + lambda_L1*|G(real,cond_real)-real|_1."""
    real = torch.from_numpy(batch["image"].transpose(0, 3, 1, 2).copy())
    cond_r, cmap_r = _cmap(batch["bin"])
    cond_t, cmap_t = _cmap(batch["target_bin"])
    if cond_inject == "input":
        fake = tG(torch.cat([real, cmap_t], 1))
        idt = tG(torch.cat([real, cmap_r], 1))
    else:
        fake = tG(real, cond_t)
        idt = tG(real, cond_r)
    # D update (detached fake; pool off = identity)
    opt_d.zero_grad()
    pr = tD(torch.cat([real, cmap_r], 1))
    pf = tD(torch.cat([fake.detach(), cmap_t], 1))
    loss_d_real = F.mse_loss(pr, torch.ones_like(pr))
    loss_d_fake = F.mse_loss(pf, torch.zeros_like(pf))
    loss_d = 0.5 * (loss_d_real + loss_d_fake)
    loss_d.backward()
    opt_d.step()
    # G update against the freshly-updated D (sequential reference mode)
    opt_g.zero_grad()
    opt_d.zero_grad()          # G backward deposits grads into D; discard
    pf2 = tD(torch.cat([fake, cmap_t], 1))
    loss_g_gan = F.mse_loss(pf2, torch.ones_like(pf2))
    loss_g_l1 = F.l1_loss(idt, real)
    loss_g = loss_g_gan + 100.0 * loss_g_l1
    loss_g.backward()
    opt_g.step()
    return {"loss_D": float(loss_d), "loss_D_real": float(loss_d_real),
            "loss_D_fake": float(loss_d_fake), "loss_G": float(loss_g),
            "loss_G_GAN": float(loss_g_gan), "loss_G_L1": float(loss_g_l1)}


def _flat(tree):
    return np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(tree)])


def _torch_g_flat(tG):
    # torch state_dict order differs from the flax tree-flatten order, so
    # compare aggregate delta statistics, not aligned vectors: sort both.
    return np.concatenate([p.detach().numpy().ravel()
                           for p in tG.parameters()])


@pytest.mark.slow
@pytest.mark.parametrize("cond_inject", ["input", "bottleneck"])
def test_lockstep_full_step_parity(cond_inject):
    cfg = _cfg(cond_inject)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(3), 1000)
    step = jax.jit(make_train_step(cfg, G, D, steps_per_epoch=1000))

    # --- identical weights on both sides --------------------------------- #
    stem_nc = 3 + (NB if cond_inject == "input" else 0)
    tG = ResnetG(stem_nc, 3, ngf=NGF, n_blocks=6, cond_nc=NB,
                 cond_inject=cond_inject)
    sd = export_generator_pth(state.g_params, "resnet_6blocks",
                              tG.state_dict(), cond_inject=cond_inject)
    tG.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    tD = TorchPatchD(3 + NB, NDF)
    _copy_d_params(state.d_params, tD)

    opt_g = torch.optim.Adam(tG.parameters(), lr=LR, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(tD.parameters(), lr=LR, betas=(0.5, 0.999))

    g0_j, d0_j = _flat(state.g_params), _flat(state.d_params)
    g0_t, d0_t = _torch_g_flat(tG), _torch_g_flat(tD)

    n_steps = 3
    for i, batch in enumerate(_batches(n_steps)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, jb)
        tm = _torch_step(tG, tD, opt_g, opt_d, batch, cond_inject)
        for k, tv in tm.items():
            jv = float(metrics[k])
            assert abs(jv - tv) <= 1e-4 + 1e-4 * abs(tv), (
                f"step {i}: {k} diverged: jax={jv} torch={tv}")

    # --- updated-parameter agreement (Adam sign-flip envelope) ----------- #
    dg_j = _flat(state.g_params) - g0_j
    dg_t = _torch_g_flat(tG) - g0_t
    if dg_t.size > dg_j.size:
        # the torch mirror carries the template's IN-inert conv biases
        # (zero-init, analytically-zero grad — layers.py
        # conv_bias_before_norm drops them on the flax side); their torch
        # deltas are pure eps-floor Adam noise. Pad the flax vector with the
        # exact zeros those parameters hold there.
        dg_j = np.concatenate([dg_j, np.zeros(dg_t.size - dg_j.size,
                                              dg_j.dtype)])
    for name, dj, dt in [
            ("G", dg_j, dg_t),
            ("D", _flat(state.d_params) - d0_j, _torch_g_flat(tD) - d0_t)]:
        # flatten orders differ between stacks -> compare distributions of
        # the per-parameter total updates (order-free but collapse-sensitive)
        dj_s, dt_s = np.sort(dj), np.sort(dt)
        diff = np.abs(dj_s - dt_s)
        assert np.median(diff) < 2e-6, (name, np.median(diff))
        assert diff.max() <= 2.1 * n_steps * LR, (name, diff.max())
        frac_bad = float((diff > 0.25 * LR).mean())
        assert frac_bad < 2e-3, (name, frac_bad)


@pytest.mark.slow
def test_single_step_param_parity_aligned():
    """One step, exact per-tensor alignment for the D (whose flax->torch
    correspondence is explicit): every updated D tensor matches within the
    Adam first-step envelope, elementwise."""
    cfg = _cfg("input")
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(5), 1000)
    step = jax.jit(make_train_step(cfg, G, D, steps_per_epoch=1000))

    tG = ResnetG(3 + NB, 3, ngf=NGF, n_blocks=6)
    sd = export_generator_pth(state.g_params, "resnet_6blocks",
                              tG.state_dict())
    tG.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    tD = TorchPatchD(3 + NB, NDF)
    _copy_d_params(state.d_params, tD)
    opt_g = torch.optim.Adam(tG.parameters(), lr=LR, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(tD.parameters(), lr=LR, betas=(0.5, 0.999))

    batch = _batches(1, seed=9)[0]
    state1, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    _torch_step(tG, tD, opt_g, opt_d, batch, "input")

    # per-tensor deltas against the ORIGINAL flax weights (the copy source),
    # elementwise — the flax->torch correspondence is explicit for the D
    convs = [tD.c0, tD.c1, tD.c2, tD.c3, tD.c4]
    for i, conv in enumerate(convs):
        w0 = np.asarray(state.d_params[f"TorchConv_{i}"]["kernel"]
                        ).transpose(3, 2, 0, 1)
        w1_t = conv.weight.detach().numpy()
        w1_j = np.asarray(state1.d_params[f"TorchConv_{i}"]["kernel"]
                          ).transpose(3, 2, 0, 1)
        diff = np.abs(w1_j - w0 - (w1_t - w0))
        # one Adam step moves each weight by <= lr; noise-driven sign flips
        # are bounded by 2*lr and must be rare
        assert diff.max() <= 2.1 * LR, (i, diff.max())
        assert float((diff > 0.25 * LR).mean()) < 2e-3, i
        assert np.median(diff) < 2e-6, (i, np.median(diff))
