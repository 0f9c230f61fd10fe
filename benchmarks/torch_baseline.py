#!/usr/bin/env python
"""Reference-equivalent PyTorch training-step benchmark.

The reference (phymhan/pc-gan) publishes no throughput numbers and its mount
is empty here (SURVEY.md SS0/SS6), so the comparison baseline is measured: a
from-scratch torch implementation of the SAME training semantics the
reference family uses (conditional resnet-9blocks G + 70x70 PatchGAN D,
LSGAN + L1, alternating Adam steps, CPU torchvision-style preprocessing in
the loop), run on whatever torch backend is available (CPU in this sandbox;
CUDA if present). Writes benchmarks/baseline_torch.json consumed by bench.py.

This file is measurement harness code written for this repo — NOT reference
source (none exists in this environment).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np
import torch
import torch.nn as nn


def conv_norm_relu(cin, cout, k, s, p, leaky=False, norm=True):
    layers = [nn.Conv2d(cin, cout, k, s, p)]
    if norm:
        layers.append(nn.InstanceNorm2d(cout))
    layers.append(nn.LeakyReLU(0.2) if leaky else nn.ReLU(True))
    return layers


class ResBlock(nn.Module):
    def __init__(self, dim, norm=nn.InstanceNorm2d, bias=True):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=bias),
            norm(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=bias),
            norm(dim))

    def forward(self, x):
        return x + self.block(x)


class ResnetG(nn.Module):
    """Mirror of the flax ResnetGenerator. ``cond_inject='input'`` (default,
    template-faithful): caller concats the condition map to x and the whole
    net is one Sequential — state_dict layout unchanged from round 1.
    ``cond_inject='bottleneck'`` (the repo's recommended effective-resnet
    conditioning): stem takes bare x; after the downsampling convs a 1x1
    projection consumes [features; cond map] — registration order matches
    pth_import.resnet_generator_order(cond_inject='bottleneck')."""

    def __init__(self, in_nc, out_nc, ngf=64, n_blocks=9, batchnorm=False,
                 cond_nc=0, cond_inject="input"):
        super().__init__()
        norm = nn.BatchNorm2d if batchnorm else nn.InstanceNorm2d
        bias = not batchnorm          # template: no conv bias under affine BN
        head = [nn.ReflectionPad2d(3), nn.Conv2d(in_nc, ngf, 7, bias=bias),
                norm(ngf), nn.ReLU(True),
                nn.Conv2d(ngf, ngf * 2, 3, 2, 1, bias=bias), norm(ngf * 2),
                nn.ReLU(True),
                nn.Conv2d(ngf * 2, ngf * 4, 3, 2, 1, bias=bias),
                norm(ngf * 4), nn.ReLU(True)]
        tail = [ResBlock(ngf * 4, norm, bias) for _ in range(n_blocks)]
        tail += [nn.ConvTranspose2d(ngf * 4, ngf * 2, 3, 2, 1, 1, bias=bias),
                 norm(ngf * 2), nn.ReLU(True),
                 nn.ConvTranspose2d(ngf * 2, ngf, 3, 2, 1, 1, bias=bias),
                 norm(ngf), nn.ReLU(True),
                 nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_nc, 7),
                 nn.Tanh()]
        self.bottleneck_cond = cond_inject == "bottleneck"
        if self.bottleneck_cond:
            self.net = nn.Sequential(*head)
            self.proj = nn.Conv2d(ngf * 4 + cond_nc, ngf * 4, 1, bias=bias)
            self.tail = nn.Sequential(*tail)
        else:
            self.net = nn.Sequential(*(head + tail))

    def forward(self, x, cond=None):
        if not self.bottleneck_cond:
            return self.net(x)
        h = self.net(x)
        cmap = cond[:, :, None, None].expand(-1, -1, h.shape[2], h.shape[3])
        return self.tail(self.proj(torch.cat([h, cmap], 1)))


class UnetBlock(nn.Module):
    """pix2pix-template-style recursive U-Net block (torch mirror used for
    .pth importer parity tests)."""

    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        downconv = nn.Conv2d(input_nc, inner_nc, 4, 2, 1)
        downrelu = nn.LeakyReLU(0.2, True)
        downnorm = nn.InstanceNorm2d(inner_nc)
        uprelu = nn.ReLU(True)
        upnorm = nn.InstanceNorm2d(outer_nc)
        if outermost:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            model = [downconv] + ([submodule] if submodule else []) \
                + [uprelu, upconv, nn.Tanh()]
        elif innermost:
            upconv = nn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1)
            model = [downrelu, downconv, uprelu, upconv, upnorm]
        else:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            model = [downrelu, downconv, downnorm, submodule, uprelu, upconv,
                     upnorm]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


def build_unet(input_nc, output_nc, num_downs, ngf=64):
    blk = UnetBlock(ngf * 8, ngf * 8, innermost=True)
    for _ in range(num_downs - 5):
        blk = UnetBlock(ngf * 8, ngf * 8, submodule=blk)
    blk = UnetBlock(ngf * 4, ngf * 8, submodule=blk)
    blk = UnetBlock(ngf * 2, ngf * 4, submodule=blk)
    blk = UnetBlock(ngf, ngf * 2, submodule=blk)
    return UnetBlock(output_nc, ngf, input_nc=input_nc, submodule=blk,
                     outermost=True)


class PatchD(nn.Module):
    def __init__(self, in_nc, ndf=64):
        super().__init__()
        layers = [nn.Conv2d(in_nc, ndf, 4, 2, 1), nn.LeakyReLU(0.2)]
        layers += conv_norm_relu(ndf, ndf * 2, 4, 2, 1, leaky=True)
        layers += conv_norm_relu(ndf * 2, ndf * 4, 4, 2, 1, leaky=True)
        layers += conv_norm_relu(ndf * 4, ndf * 8, 4, 1, 1, leaky=True)
        layers += [nn.Conv2d(ndf * 8, 1, 4, 1, 1)]
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


def preprocess_np(imgs_u8, load, crop, rng):
    """torchvision-equivalent CPU path: resize(bicubic) -> randomcrop ->
    flip -> normalize, via PIL like the reference's get_transform."""
    from PIL import Image
    out = np.empty((imgs_u8.shape[0], 3, crop, crop), np.float32)
    for i, im in enumerate(imgs_u8):
        pil = Image.fromarray(im).resize((load, load),
                                         Image.Resampling.BICUBIC)
        y, x = rng.integers(0, load - crop + 1, 2)
        pil = pil.crop((x, y, x + crop, y + crop))
        arr = np.asarray(pil, np.float32) / 127.5 - 1.0
        if rng.random() < 0.5:
            arr = arr[:, ::-1]
        out[i] = arr.transpose(2, 0, 1)
    return torch.from_numpy(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--threads", type=int, default=0, help="0 = torch default")
    args = p.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)
    dev = "cuda" if torch.cuda.is_available() else "cpu"
    nb = 10
    G = ResnetG(3 + nb, 3).to(dev)
    D = PatchD(3 + nb).to(dev)
    opt_g = torch.optim.Adam(G.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(D.parameters(), lr=2e-4, betas=(0.5, 0.999))
    mse = nn.MSELoss()
    rng = np.random.default_rng(0)
    native = rng.integers(0, 256, (args.batch, 200, 200, 3), dtype=np.uint8)

    def step():
        imgs = preprocess_np(native, int(args.size * 143 / 128), args.size,
                             rng).to(dev)
        b = imgs.shape[0]
        cond = torch.eye(nb)[torch.randint(0, nb, (b,))].to(dev)
        cmap = cond[:, :, None, None].expand(-1, -1, args.size, args.size)
        fake = G(torch.cat([imgs, cmap], 1))
        # D step
        opt_d.zero_grad()
        pr = D(torch.cat([imgs, cmap], 1))
        pf = D(torch.cat([fake.detach(), cmap], 1))
        ld = 0.5 * (mse(pr, torch.ones_like(pr)) + mse(pf, torch.zeros_like(pf)))
        ld.backward()
        opt_d.step()
        # G step (+ identity L1 second forward, as in the fused JAX step)
        opt_g.zero_grad()
        pf2 = D(torch.cat([fake, cmap], 1))
        idt = G(torch.cat([imgs, cmap], 1))
        lg = mse(pf2, torch.ones_like(pf2)) + 100.0 * nn.functional.l1_loss(idt, imgs)
        lg.backward()
        opt_g.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    if dev == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0
    rate = args.batch * args.steps / dt
    out = {
        "imgs_per_sec_per_chip_128px": round(rate, 3),
        "device": dev,
        "torch": torch.__version__,
        "batch": args.batch, "size": args.size, "steps": args.steps,
        "note": "reference-equivalent semantics measured locally; the "
                "reference publishes no numbers (SURVEY.md SS6)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_torch.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
