"""UTKFace-style folder dataset (SURVEY.md SS2 C10).

The reference parses the age label from the UTKFace filename convention
``{age}_{gender}_{race}_{datetime}.jpg`` [P]. This dataset scans a folder,
parses ages, and host-decodes JPEGs to fixed-size u8 arrays; everything
downstream (resize/crop/flip/normalize) runs on device (ops/preprocess.py).

Host work is deliberately minimal: decode + (only if source sizes vary) one
PIL resize to the canonical native canvas. Aligned UTKFace is uniformly
200x200, so the common path is decode-only.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def parse_age(filename: str) -> Optional[int]:
    base = os.path.basename(filename)
    head = base.split("_")[0]
    try:
        age = int(head)
    except ValueError:
        return None
    return age if 0 <= age <= 120 else None


def list_images(root: str, max_size: int = -1) -> List[str]:
    out = []
    for dirpath, _, names in sorted(os.walk(root)):
        for n in sorted(names):
            if n.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(dirpath, n))
    if max_size and max_size > 0:
        out = out[:max_size]
    return out


def probe_native_size(paths: List[str], cap: int = 0,
                      default: int = 200) -> int:
    """Auto-detect the host-decode canvas: the min spatial dim of the first
    readable image (PIL header-only open — no pixel decode). Uniform-size
    folders (aligned UTKFace 200px, CACD 250px) then decode straight onto
    their own canvas with NO host resample — the reference's exact transform
    chain (PIL decode -> one resize to load_size, which runs on device here).
    ``cap`` > 0 bounds the canvas (mixed folders with huge photos would
    otherwise blow up host batches); falls back to ``default`` when nothing
    is readable."""
    from PIL import Image
    for p in paths[:64]:
        try:
            with Image.open(p) as im:
                w, h = im.size
        except Exception:
            continue
        n = max(1, min(w, h))
        return min(n, cap) if cap and cap > 0 else n
    return default


class UTKFaceDataset:
    """Protocol: __len__, ages, get_raw(i) -> {'image': u8 (native,native,3), 'age': int}."""

    def __init__(self, root: str, native: int = 200, max_size: int = -1,
                 require_age: bool = True, decode_m: int = 8,
                 native_cap: int = 0):
        from PIL import Image  # host-side decode only
        self._Image = Image
        # decode_m/8 = libjpeg DCT-domain downscale (NON-parity fast path
        # for core-starved hosts; --host_decode_m). The emitted canvas
        # shrinks to ceil(native*m/8). get_raw routes through the native
        # decoder too, so batch and per-image paths match exactly; the pure
        # PIL fallback is exact for m in {1,2,4,8} (draft) and approximate
        # otherwise (see get_raw).
        self.decode_m = max(1, min(8, int(decode_m)))
        paths = list_images(root, -1)
        # native == 0: auto-detect the canvas from the folder itself
        # (--native_size 0, the default) so CACD-style 250px sources don't
        # get force-resampled through UTKFace's 200px canvas
        self.native = int(native) if native and native > 0 else (
            probe_native_size(paths, cap=native_cap))
        self.out_size = -(-self.native * self.decode_m // 8)
        items: List[Tuple[str, int]] = []
        for p in paths:
            age = parse_age(p)
            if age is None:
                if require_age:
                    continue
                age = 0
            items.append((p, age))
        if max_size and max_size > 0:
            items = items[:max_size]
        if not items:
            raise FileNotFoundError(
                f"no labeled images under {root} (expected UTKFace-style "
                f"'age_*.jpg' names)")
        self.paths = [p for p, _ in items]
        self.ages = np.array([a for _, a in items], np.int64)

    def __len__(self):
        return len(self.paths)

    def get_raw(self, i: int):
        # prefer the native decoder even per-image: for decode_m not in
        # {1,2,4,8} PIL's draft() cannot reproduce libjpeg's M/8 DCT scaling
        # (it only supports power-of-two scales), so the PIL route below is
        # an APPROXIMATION (draft to the nearest pow-2, then bicubic) used
        # only when the native library is unavailable or the image is not a
        # decodable JPEG.
        p = self.paths[i]
        if p.lower().endswith((".jpg", ".jpeg")):
            from pcgan_tpu import native
            if native.available():
                imgs, status = native.decode_batch(
                    [p], self.out_size, self.out_size, threads=1,
                    scale_num=self.decode_m)
                if status[0] == native.OK:
                    return {"image": imgs[0], "age": int(self.ages[i])}
        img = self._Image.open(p)
        if self.decode_m < 8 and img.format == "JPEG":
            img.draft("RGB", (self.out_size, self.out_size))
        img = img.convert("RGB")
        if img.size != (self.out_size, self.out_size):
            img = img.resize((self.out_size, self.out_size),
                             self._Image.Resampling.BICUBIC)
        return {"image": np.asarray(img, np.uint8), "age": int(self.ages[i])}

    def get_raw_batch(self, idx, num_threads: int = 8):
        """Whole-batch decode through the native C++ thread pool
        (pcgan_tpu/native) — bit-identical to get_raw for every image the
        fast path serves; anything it reports (non-native size, CMYK,
        corrupt stream) is filled by the per-image PIL path. Returns None
        when the native library is unavailable or the batch contains
        non-JPEG files — the caller then uses its own get_raw fan-out."""
        from pcgan_tpu import native
        paths = [self.paths[int(i)] for i in idx]
        if not native.available() or not all(
                p.lower().endswith((".jpg", ".jpeg")) for p in paths):
            return None
        imgs, status = native.decode_batch(paths, self.out_size,
                                           self.out_size,
                                           threads=num_threads,
                                           scale_num=self.decode_m)
        for j in np.nonzero(status)[0]:
            imgs[j] = self.get_raw(int(idx[j]))["image"]
        ages = self.ages[np.asarray(idx, np.int64)]
        return {"image": imgs, "age": ages.astype(np.int64)}
