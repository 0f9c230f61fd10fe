"""Image saving + HTML results pages (SURVEY.md SS2 C13).

The reference writes visdom live plots and HTML grids of
[input | aged@bin0 | ... | aged@binK]. Visdom needs a server (none in a TPU
pod); this module keeps the HTML-grid surface (what ``test.py`` users
consume) and PNG tiles, dropping the visdom dependency by design.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


def tensor_to_u8(img) -> np.ndarray:
    """(H,W,C) float in [-1,1] -> u8 RGB (reference util.tensor2im semantics)."""
    x = np.asarray(img, np.float32)
    x = (np.clip(x, -1.0, 1.0) + 1.0) * 127.5
    return np.round(x).astype(np.uint8)


def save_image(img, path: str):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = img if img.dtype == np.uint8 else tensor_to_u8(img)
    Image.fromarray(arr).save(path)


def save_animation(frames, path: str, duration_ms: int = 80):
    """frames: (T,H,W,C) float in [-1,1] (or u8) -> looping animated image.

    The ``test.py --anim`` output surface. Extension picks the container:
    ``.gif`` (universal, 256-color quantized) or ``.webp`` (full color,
    needs a webp-enabled Pillow — every browser since 2020 plays it)."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(frames)
    ims = [Image.fromarray(f if f.dtype == np.uint8 else tensor_to_u8(f))
           for f in arr]
    if len(ims) < 2:
        raise ValueError(f"animation needs >= 2 frames, got {len(ims)}")
    ims[0].save(path, save_all=True, append_images=ims[1:],
                duration=duration_ms, loop=0)


class HTMLPage:
    """Minimal HTML index of image rows (reference util/html.py surface)."""

    def __init__(self, web_dir: str, title: str):
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.title = title
        self.rows: List = []

    def add_header(self, text: str):
        self.rows.append(("h", text))

    def add_images(self, ims: Sequence[str], txts: Sequence[str],
                   width: int = 256):
        self.rows.append(("imgs", list(zip(ims, txts)), width))

    def save(self):
        parts = [f"<!DOCTYPE html><html><head><title>{self.title}</title>"
                 "</head><body>"]
        for row in self.rows:
            if row[0] == "h":
                parts.append(f"<h3>{row[1]}</h3>")
            else:
                _, pairs, width = row
                parts.append("<table border='1' style='border-collapse:collapse'><tr>")
                for im, txt in pairs:
                    parts.append(
                        f"<td style='text-align:center'><img src='images/{im}' "
                        f"width='{width}'><br>{txt}</td>")
                parts.append("</tr></table>")
        parts.append("</body></html>")
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write("\n".join(parts))


def save_visuals_row(page: HTMLPage, name: str, visuals: Dict[str, np.ndarray],
                     width: int = 256):
    """visuals: label -> (H,W,C) float image in [-1,1]."""
    ims, txts = [], []
    for label, img in visuals.items():
        fn = f"{name}_{label}.png"
        save_image(img, os.path.join(page.img_dir, fn))
        ims.append(fn)
        txts.append(label)
    page.add_header(name)
    page.add_images(ims, txts, width)
