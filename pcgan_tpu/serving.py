"""AOT serving export: the trained generator as a self-contained StableHLO
artifact (SURVEY.md SS2 C2 sampling surface / BASELINE config 4 batch
inference, taken to its production-serving conclusion).

The reference's deployment story is "load the .pth in a torch process and
call the module" — every serving host needs the model code, the options
parser, and a framework that re-traces on every shape. The TPU-native
counterpart exports ONCE through ``jax.export``:

- the generator's weights are baked into the program as constants — the
  artifact is the model, no Flax/model-zoo/config needed at load time;
- the batch dimension is exported SYMBOLICALLY, so one artifact serves any
  request batch size with zero retraces (XLA compiles per concrete shape at
  first use, from the already-lowered StableHLO);
- multi-platform lowering (``tpu`` + ``cpu`` by default): the same bytes run
  on a TPU serving fleet and in CPU CI/integration tests;
- the public call contract is fixed at export: f32 images in [-1, 1] and an
  f32 condition row (one-hot age bins, or a 1-channel normalized score for
  ``cond_mode=score``) -> f32 images in [-1, 1]. Compute-dtype casts
  (bf16 on the perf path) happen inside the artifact.

``load_exported`` needs only jax + numpy — it never imports the model code
(self-containment is pinned by tests/test_serving.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import numpy as np

_META = "meta.json"
_FORMAT = "pcgan_tpu.serving/1"
_ARTIFACTS = {"generator": "generator.stablehlo",
              "comparator": "comparator.stablehlo"}
_ARTIFACT = _ARTIFACTS["generator"]


def make_infer_fn(cfg, G):
    """(g_variables, images f32, cond f32) -> f32 fakes — the fixed serving
    contract around ``G.apply`` (eval mode, casts inside)."""
    import jax.numpy as jnp
    compute_dtype = (jnp.bfloat16 if cfg.model.dtype == "bfloat16"
                     else jnp.float32)

    def fn(g_variables, images, cond):
        out = G.apply(g_variables, images.astype(compute_dtype),
                      cond.astype(compute_dtype), train=False)
        return out.astype(jnp.float32)

    return fn


def export_generator(cfg, g_variables, out_dir: str,
                     platforms: Sequence[str] = ("tpu", "cpu"),
                     fixed_batch: Optional[int] = None,
                     ema_source: bool = False, G: Any = None) -> str:
    """Serialize the generator to ``out_dir/generator.stablehlo`` (+ meta).

    ``fixed_batch=None`` exports a symbolic batch dimension; an integer pins
    it (the loader then pads/slices requests to that size). Returns the
    artifact path."""
    import jax
    import jax.numpy as jnp

    fn = make_infer_fn(cfg, G=G if G is not None else _define_g(cfg))
    s = cfg.data.crop_size
    cond_nc = cfg.cond_nc

    # close over the weights -> they serialize as module constants
    def serve(images, cond):
        return fn(g_variables, images, cond)

    if fixed_batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(fixed_batch)
    img_spec = jax.ShapeDtypeStruct((b, s, s, cfg.data.input_nc), jnp.float32)
    cond_spec = jax.ShapeDtypeStruct((b, cond_nc), jnp.float32)
    exported = jax.export.export(
        jax.jit(serve), platforms=list(platforms))(img_spec, cond_spec)

    _guard_out_dir(out_dir, "generator")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, _ARTIFACT)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    meta = {
        "format": _FORMAT,
        "kind": "generator",
        "platforms": list(platforms),
        "fixed_batch": fixed_batch,
        "crop_size": s,
        "input_nc": cfg.data.input_nc,
        "output_nc": cfg.data.output_nc,
        "cond_nc": cond_nc,
        "cond_mode": cfg.model.cond_mode,
        "n_age_bins": cfg.data.n_age_bins,
        "max_age": cfg.data.max_age,
        "netG": cfg.model.netG,
        "compute_dtype": cfg.model.dtype,
        "ema_source": bool(ema_source),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return path


def _define_g(cfg):
    from pcgan_tpu.models import define_G
    return define_G(cfg)


def _guard_out_dir(out_dir: str, kind: str):
    """Refuse to repoint an existing export dir at a DIFFERENT artifact
    kind — overwriting meta.json would silently orphan the other artifact
    and break every host serving the directory."""
    meta_path = os.path.join(out_dir, _META)
    if not os.path.isfile(meta_path):
        return
    try:
        with open(meta_path) as f:
            old = json.load(f)
    except (OSError, json.JSONDecodeError):
        return
    old_kind = old.get("kind", "generator") if isinstance(old, dict) else None
    if old_kind is not None and old_kind != kind:
        raise ValueError(
            f"{out_dir} already holds a {old_kind} export; write the "
            f"{kind} to a separate out_dir")


def export_comparator(cfg, c_vars, out_dir: str,
                      platforms: Sequence[str] = ("tpu", "cpu"),
                      fixed_batch: Optional[int] = None,
                      C: Any = None) -> str:
    """Scoring-as-a-service: serialize the pretrained comparator to
    ``out_dir/comparator.stablehlo`` — f32 [-1,1] NHWC images ->
    (mu, log_var) f32 scores with uncertainty. The deployable twin of
    tools/sort_unlabeled.py (SURVEY.md SS4.3: the comparator 'sorts'
    unlabeled data); a labeling fleet can score pools without the model
    code or training stack."""
    import jax
    import jax.numpy as jnp

    if C is None:
        from pcgan_tpu.models import define_C
        C = define_C(cfg)
    compute_dtype = (jnp.bfloat16 if cfg.model.dtype == "bfloat16"
                     else jnp.float32)

    def serve(images):
        mu, log_var = C.apply(c_vars, images.astype(compute_dtype),
                              train=False)
        return mu.astype(jnp.float32), log_var.astype(jnp.float32)

    s = cfg.data.crop_size
    if fixed_batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(fixed_batch)
    img_spec = jax.ShapeDtypeStruct((b, s, s, cfg.data.input_nc), jnp.float32)
    exported = jax.export.export(
        jax.jit(serve), platforms=list(platforms))(img_spec)

    _guard_out_dir(out_dir, "comparator")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, _ARTIFACTS["comparator"])
    with open(path, "wb") as f:
        f.write(exported.serialize())
    meta = {
        "format": _FORMAT,
        "kind": "comparator",
        "platforms": list(platforms),
        "fixed_batch": fixed_batch,
        "crop_size": s,
        "input_nc": cfg.data.input_nc,
        "compute_dtype": cfg.model.dtype,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return path


class ServedComparator:
    """A loaded comparator artifact: ``__call__(images) -> (mu, log_var)``;
    ``score(images) -> mu``. Fixed-batch artifacts pad + slice like the
    generator's."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = dict(meta)

    def __call__(self, images: np.ndarray):
        images = np.asarray(images, np.float32)
        if images.ndim != 4:
            raise ValueError("expected images (B,H,W,C)")
        b = images.shape[0]
        if b == 0:
            return (np.zeros((0,), np.float32), np.zeros((0,), np.float32))
        fb = self.meta.get("fixed_batch")
        if fb is None:
            mu, log_var = self._exported.call(images)
            return np.asarray(mu), np.asarray(log_var)
        mus, lvs = [], []
        for at in range(0, b, fb):
            chunk = images[at:at + fb]
            k = chunk.shape[0]
            if k < fb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], fb - k, axis=0)], axis=0)
            mu, lv = self._exported.call(chunk)
            mus.append(np.asarray(mu)[:k])
            lvs.append(np.asarray(lv)[:k])
        return np.concatenate(mus), np.concatenate(lvs)

    def score(self, images: np.ndarray) -> np.ndarray:
        return self(images)[0]


class ServedGenerator:
    """A loaded serving artifact. Only needs jax + numpy — no model code.

    ``__call__(images, cond)``: f32 [-1,1] NHWC batch + condition rows ->
    f32 fakes. ``progression(images)``: every condition for every input in
    ONE batched call -> (B, n_conditions, H, W, C) — the reference's aging
    grid (BASELINE config 4) as a single MXU-friendly dispatch.
    """

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = dict(meta)

    # -- call ---------------------------------------------------------------
    def _validate(self, images, cond):
        images = np.asarray(images, np.float32)
        cond = np.asarray(cond, np.float32)
        if images.ndim != 4 or cond.ndim != 2:
            raise ValueError("expected images (B,H,W,C) and cond (B,K)")
        if images.shape[0] != cond.shape[0]:
            raise ValueError(
                f"batch mismatch: images {images.shape[0]} vs cond "
                f"{cond.shape[0]}")
        return images, cond

    def _empty(self, images):
        # natural empty result: the symbolic dim rejects b=0 and the
        # fixed-batch chunker would concatenate nothing
        return np.zeros((0, *images.shape[1:-1],
                         int(self.meta["output_nc"])), np.float32)

    def __call__(self, images: np.ndarray, cond: np.ndarray) -> np.ndarray:
        images, cond = self._validate(images, cond)
        if images.shape[0] == 0:
            return self._empty(images)
        fb = self.meta.get("fixed_batch")
        if fb is None:
            return np.asarray(self._exported.call(images, cond))
        # fixed-batch artifact: serve any request size by pad + slice
        n = images.shape[0]
        out = []
        for at in range(0, n, fb):
            img_c = images[at:at + fb]
            cnd_c = cond[at:at + fb]
            k = img_c.shape[0]
            if k < fb:
                img_c = np.concatenate(
                    [img_c, np.repeat(img_c[-1:], fb - k, axis=0)], axis=0)
                cnd_c = np.concatenate(
                    [cnd_c, np.repeat(cnd_c[-1:], fb - k, axis=0)], axis=0)
            out.append(np.asarray(self._exported.call(img_c, cnd_c))[:k])
        return np.concatenate(out, axis=0)

    # -- conditions ---------------------------------------------------------
    def all_conditions(self) -> np.ndarray:
        """(n_conditions, cond_nc): every age bin one-hot, or the even sweep
        of the normalized score range for score-mode artifacts."""
        nb = int(self.meta["n_age_bins"])
        if self.meta["cond_mode"] == "score":
            return np.linspace(-1.0, 1.0, nb, dtype=np.float32)[:, None]
        return np.eye(nb, dtype=np.float32)

    def sweep_conditions(self, n_frames: int) -> np.ndarray:
        """(n_frames, cond_nc) SMOOTH condition sweep for animations:
        score mode sweeps the normalized [-1, 1] range; onehot mode
        linearly blends adjacent bins' one-hots (rows sum to 1; frames
        landing exactly on a bin ARE that bin's one-hot — the
        data/binning.py interp_bins_onehot semantics, reimplemented in
        numpy so serving hosts stay jax+numpy-only)."""
        if n_frames < 2:
            raise ValueError(f"n_frames must be >= 2, got {n_frames}")
        nb = int(self.meta["n_age_bins"])
        if self.meta["cond_mode"] == "score":
            return np.linspace(-1.0, 1.0, n_frames,
                               dtype=np.float32)[:, None]
        p = np.linspace(0.0, float(nb - 1), n_frames)
        lo = np.clip(np.floor(p).astype(np.int32), 0, nb - 1)
        hi = np.clip(lo + 1, 0, nb - 1)
        frac = (p - lo).astype(np.float32)[:, None]
        eye = np.eye(nb, dtype=np.float32)
        return (1.0 - frac) * eye[lo] + frac * eye[hi]

    def progression(self, images: np.ndarray, call=None) -> np.ndarray:
        """Aging grid (B, n_conditions, H, W, C). ``call`` overrides the
        generator invocation (e.g. a serving host's coalescing dispatch)
        so the repeat/tile pairing has ONE source of truth."""
        return self._sweep(images, self.all_conditions(), call)

    def animation(self, images: np.ndarray, n_frames: int = 24,
                  call=None) -> np.ndarray:
        """Smooth aging sweep (B, n_frames, H, W, C) — the serving twin of
        ``test.py --anim`` (frames on a bin match the progression grid)."""
        return self._sweep(images, self.sweep_conditions(n_frames), call)

    def _sweep(self, images: np.ndarray, conds: np.ndarray,
               call=None) -> np.ndarray:
        call = self if call is None else call
        images = np.asarray(images, np.float32)
        if images.ndim != 4:
            raise ValueError("expected images (B,H,W,C)")
        nb = conds.shape[0]
        b = images.shape[0]
        x = np.repeat(images, nb, axis=0)
        c = np.tile(conds, (b, 1))
        fakes = call(x, c)
        return fakes.reshape(b, nb, *fakes.shape[1:])

    # -- multi-device serving -------------------------------------------------
    def data_parallel(self, mesh=None):
        """Multi-chip serving from the same artifact: returns a callable
        ``(images, cond) -> fakes`` that shard_maps the exported module over
        the mesh's first axis — each device runs the module on its batch
        shard, XLA scatters/gathers over ICI. Ragged batches pad to a
        multiple of the axis size (result sliced back). Requires a
        symbolic-batch artifact (the per-device shard size varies)."""
        import jax
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P
        if self.meta.get("fixed_batch") is not None:
            raise ValueError(
                "data_parallel needs a symbolic-batch artifact (export "
                "without --fixed_batch)")
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("data",))
        ax = mesh.axis_names[0]
        n = int(mesh.shape[ax])
        exported = self._exported
        sharded = jax.jit(shard_map(
            lambda x, c: exported.call(x, c), mesh=mesh,
            in_specs=(P(ax), P(ax)), out_specs=P(ax)))

        def call(images, cond):
            images, cond = self._validate(images, cond)
            b = images.shape[0]
            if b == 0:
                return self._empty(images)
            pad = (-b) % n
            if pad:
                images = np.concatenate(
                    [images, np.repeat(images[-1:], pad, axis=0)], axis=0)
                cond = np.concatenate(
                    [cond, np.repeat(cond[-1:], pad, axis=0)], axis=0)
            return np.asarray(sharded(images, cond))[:b]

        return call


def load_exported(out_dir: str):
    """Load an exported artifact directory -> ServedGenerator or
    ServedComparator (by the meta's ``kind``). Raises with a clear message
    on a missing/foreign directory."""
    import jax
    meta_path = os.path.join(out_dir, _META)
    if not os.path.isfile(meta_path):
        raise FileNotFoundError(
            f"{out_dir} is not a pcgan_tpu serving export (need {_META} + "
            f"a .stablehlo artifact; produce one with "
            f"tools/export_serving.py)")
    with open(meta_path) as f:
        meta = json.load(f)
    if not isinstance(meta, dict) or meta.get("format") != _FORMAT:
        raise ValueError(
            f"{meta_path}: unsupported format {meta.get('format')!r} "
            f"(expected {_FORMAT!r})")
    kind = meta.get("kind", "generator")
    if kind not in _ARTIFACTS:
        raise ValueError(f"{meta_path}: unknown artifact kind {kind!r}")
    art_path = os.path.join(out_dir, _ARTIFACTS[kind])
    if not os.path.isfile(art_path):
        raise FileNotFoundError(
            f"{out_dir}: meta names a {kind} artifact but "
            f"{_ARTIFACTS[kind]} is missing")
    with open(art_path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    cls = ServedComparator if kind == "comparator" else ServedGenerator
    return cls(exported, meta)
