"""Serving export (pcgan_tpu/serving.py): a trained generator as a
self-contained StableHLO artifact — SURVEY.md SS2 C2 / BASELINE config 4
(batch inference) taken to production serving.

Pinned properties:
- export -> deserialize -> call matches the live ``G.apply`` (weights are
  baked in as constants);
- the symbolic batch dimension serves MULTIPLE batch sizes from one artifact;
- ``load_exported`` is self-contained: it runs with the model registry
  blocked, so a serving host needs no model code;
- fixed-batch artifacts pad + slice transparently;
- score-mode artifacts carry the 1-channel condition contract.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pytest


def _tiny_cfg(cond_mode="onehot", dtype="float32"):
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    return Config(
        data=DataConfig(batch_size=2, crop_size=32, load_size=36,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8, dtype=dtype,
                          cond_mode=cond_mode, cond_inject="bottleneck"))


def _init_g(cfg):
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    G = define_G(cfg)
    v = init_params(G, jax.random.PRNGKey(7),
                    jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size,
                               cfg.data.input_nc)),
                    jnp.zeros((1, cfg.cond_nc)), train=False)
    return G, v


def _rand_inputs(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    s = cfg.data.crop_size
    imgs = rng.uniform(-1, 1, (b, s, s, cfg.data.input_nc)).astype(np.float32)
    if cfg.model.cond_mode == "score":
        cond = rng.uniform(-1, 1, (b, 1)).astype(np.float32)
    else:
        cond = np.eye(cfg.data.n_age_bins, dtype=np.float32)[
            rng.integers(0, cfg.data.n_age_bins, b)]
    return imgs, cond


def test_export_roundtrip_symbolic_batch(tmp_path):
    import jax.numpy as jnp
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    path = export_generator(cfg, v, str(tmp_path), G=G)
    assert os.path.isfile(path)
    served = load_exported(str(tmp_path))
    # one artifact, several batch sizes — symbolic dim, no re-export
    for b in (1, 2, 5):
        imgs, cond = _rand_inputs(cfg, b, seed=b)
        got = served(imgs, cond)
        want = np.asarray(G.apply(v, jnp.asarray(imgs), jnp.asarray(cond),
                                  train=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_loader_needs_no_model_code(tmp_path, monkeypatch):
    """A serving host imports only pcgan_tpu.serving — pin that the load +
    call path never touches the model registry (weights + architecture live
    in the artifact)."""
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)

    import pcgan_tpu.models as models
    import pcgan_tpu.serving as serving

    def _blocked(*a, **k):
        raise AssertionError("serving load path imported the model registry")

    monkeypatch.setattr(models, "define_G", _blocked)
    monkeypatch.setattr(serving, "_define_g", _blocked)
    served = load_exported(str(tmp_path))
    imgs, cond = _rand_inputs(cfg, 3)
    out = served(imgs, cond)
    assert out.shape == imgs.shape and np.isfinite(out).all()


def test_progression_matches_sampler(tmp_path):
    import jax.numpy as jnp
    from pcgan_tpu.sample import make_sampler
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    served = load_exported(str(tmp_path))
    imgs, _ = _rand_inputs(cfg, 2)
    got = served.progression(imgs)
    want = np.asarray(make_sampler(cfg, G)(v, jnp.asarray(imgs)))
    assert got.shape == want.shape == (2, cfg.data.n_age_bins, 32, 32, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fixed_batch_pads_and_slices(tmp_path):
    import jax.numpy as jnp
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G, fixed_batch=4)
    served = load_exported(str(tmp_path))
    assert served.meta["fixed_batch"] == 4
    imgs, cond = _rand_inputs(cfg, 6)      # 4 + ragged 2 -> two padded calls
    got = served(imgs, cond)
    want = np.asarray(G.apply(v, jnp.asarray(imgs), jnp.asarray(cond),
                              train=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_score_mode_contract(tmp_path):
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg(cond_mode="score")
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    served = load_exported(str(tmp_path))
    assert served.meta["cond_mode"] == "score"
    conds = served.all_conditions()
    assert conds.shape == (cfg.data.n_age_bins, 1)
    np.testing.assert_allclose(conds[:, 0],
                               np.linspace(-1, 1, cfg.data.n_age_bins))
    grid = served.progression(_rand_inputs(cfg, 2)[0])
    assert grid.shape == (2, cfg.data.n_age_bins, 32, 32, 3)
    assert np.isfinite(grid).all()


def test_bf16_artifact_casts_inside(tmp_path):
    """The call contract is f32 even when the artifact computes in bf16."""
    import jax.numpy as jnp
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg(dtype="bfloat16")
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    served = load_exported(str(tmp_path))
    imgs, cond = _rand_inputs(cfg, 2)
    got = served(imgs, cond)
    assert got.dtype == np.float32
    want = np.asarray(G.apply(v, jnp.asarray(imgs, jnp.bfloat16),
                              jnp.asarray(cond, jnp.bfloat16),
                              train=False), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2)


def test_load_rejects_foreign_dirs(tmp_path):
    from pcgan_tpu.serving import load_exported
    with pytest.raises(FileNotFoundError, match="serving export"):
        load_exported(str(tmp_path / "nope"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "generator.stablehlo").write_bytes(b"x")
    (bad / "meta.json").write_text(json.dumps({"format": "other/9"}))
    with pytest.raises(ValueError, match="unsupported format"):
        load_exported(str(bad))


def test_input_validation(tmp_path):
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    served = load_exported(str(tmp_path))
    imgs, cond = _rand_inputs(cfg, 2)
    with pytest.raises(ValueError, match="batch mismatch"):
        served(imgs, cond[:1])
    with pytest.raises(ValueError, match=r"\(B,H,W,C\)"):
        served(imgs[0], cond)
    # empty batch: natural empty result (the symbolic dim itself rejects
    # b=0 and the fixed-batch chunker would have nothing to concatenate)
    out = served(imgs[:0], cond[:0])
    assert out.shape == (0, 32, 32, 3) and out.dtype == np.float32


def test_cli_export_verify(tmp_path):
    """tools/export_serving.py end-to-end: save a G-only checkpoint, export
    with --verify (round-trips the artifact against the live model)."""
    import subprocess
    import sys
    import jax
    from pcgan_tpu.train import create_train_state
    from pcgan_tpu.models import define_D
    from pcgan_tpu.utils import checkpoint as ckpt
    cfg = _tiny_cfg()
    G, _ = _init_g(cfg)
    D = define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0),
                               steps_per_epoch=1)
    ckpt.save_generator(state, str(tmp_path / "ck"), "run", wait=True)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "export_serving.py"),
         "--name", "run", "--checkpoints_dir", str(tmp_path / "ck"),
         "--netG", "resnet_6blocks", "--ngf", "8",
         "--cond_inject", "bottleneck", "--dtype", "float32",
         "--crop_size", "32", "--n_age_bins", "4",
         "--platforms", "cpu", "--verify",
         "--out_dir", str(tmp_path / "srv")],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "verify: max|exported - live|" in out.stdout
    assert os.path.isfile(str(tmp_path / "srv" / "generator.stablehlo"))
    meta = json.loads((tmp_path / "srv" / "meta.json").read_text())
    assert meta["netG"] == "resnet_6blocks" and meta["fixed_batch"] is None


def test_http_server_roundtrip(tmp_path):
    """tools/serve_http.py: the stdlib serving host over an artifact —
    /healthz, /generate, /progression, and a malformed request."""
    import io
    import json as jsonlib
    import threading
    import urllib.request
    import urllib.error
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from pcgan_tpu.serving import export_generator, load_exported

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, _ = serve_http.make_server(str(tmp_path), "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = jsonlib.loads(r.read())
        assert health["status"] == "ok"
        assert health["meta"]["crop_size"] == cfg.data.crop_size

        # GET / serves the self-contained browser demo page
        with urllib.request.urlopen(f"{base}/", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/html")
            page = r.read().decode()
        for needle in ("/generate_image", "/progression_image",
                       "/progression_gif", "/healthz"):
            assert needle in page
        # every meta.<key> the page's JS reads must exist in /healthz meta
        # (a renamed meta key would render "undefined" in the browser)
        for key in set(re.findall(r"meta\.([A-Za-z_][A-Za-z0-9_]*)", page)):
            assert key in health["meta"], f"demo page reads absent meta.{key}"

        imgs, cond = _rand_inputs(cfg, 3)
        buf = io.BytesIO()
        np.savez(buf, images=imgs, cond=cond)
        req = urllib.request.Request(f"{base}/generate", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            got = np.load(io.BytesIO(r.read()))
        want = load_exported(str(tmp_path))(imgs, cond)
        np.testing.assert_allclose(got, want, atol=1e-6)

        buf = io.BytesIO()
        np.savez(buf, images=imgs[:2])
        req = urllib.request.Request(f"{base}/progression",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            grid = np.load(io.BytesIO(r.read()))
        assert grid.shape == (2, cfg.data.n_age_bins, 32, 32, 3)

        buf = io.BytesIO()
        np.savez(buf, images=imgs)            # missing 'cond'
        req = urllib.request.Request(f"{base}/generate", data=buf.getvalue(),
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            st = jsonlib.loads(r.read())
        # 1 /generate (3 rows) + 1 /progression (2*nb rows) + 1 error
        assert st["requests"] == 2 and st["errors"] == 1
        assert st["rows"] == 3 + 2 * cfg.data.n_age_bins
        assert st["device_dispatches"] is None and st["uptime_s"] >= 0
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_python_client_roundtrip(tmp_path):
    """pcgan_tpu/client.py against a live serve_http host: healthz,
    generate (matches the served module bit-for-bit), progression shape,
    error mapping to ServingError."""
    import threading
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from pcgan_tpu.client import ServingClient, ServingError
    from pcgan_tpu.serving import export_generator, load_exported

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, _ = serve_http.make_server(str(tmp_path), "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        c = ServingClient(f"http://127.0.0.1:{port}", timeout=120)
        health = c.healthz()
        assert health["status"] == "ok"
        assert health["meta"]["crop_size"] == cfg.data.crop_size

        imgs, cond = _rand_inputs(cfg, 3, seed=5)
        out = c.generate(imgs, cond)
        want = np.asarray(load_exported(str(tmp_path))(imgs, cond))
        np.testing.assert_array_equal(out, want)

        grid = c.progression(imgs)
        assert grid.shape == (3, cfg.data.n_age_bins, 32, 32, 3)

        with pytest.raises(ServingError) as ei:
            c.generate(imgs[:, :16], cond)       # wrong spatial size
        assert ei.value.status == 400

        assert "pcgan" in c.metrics()
        assert c.reload()["status"] == "reloaded"   # re-read the same dir
        np.testing.assert_array_equal(c.generate(imgs, cond), want)
    finally:
        httpd.shutdown()


def test_data_parallel_serving(tmp_path):
    """Multi-chip serving: shard_map of the exported module over the 8-dev
    mesh equals the single-device call; ragged batches pad + slice; fixed-
    batch artifacts are rejected (per-device shard size varies)."""
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path / "sym"), G=G)
    served = load_exported(str(tmp_path / "sym"))
    dp = served.data_parallel()
    imgs, cond = _rand_inputs(cfg, 12)     # ragged: pads 12 -> 16 on 8 devs
    got = dp(imgs, cond)
    want = served(imgs, cond)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert dp(imgs[:0], cond[:0]).shape == (0, 32, 32, 3)

    export_generator(cfg, v, str(tmp_path / "fix"), G=G, fixed_batch=4)
    fixed = load_exported(str(tmp_path / "fix"))
    with pytest.raises(ValueError, match="symbolic-batch"):
        fixed.data_parallel()


def test_comparator_export(tmp_path):
    """Comparator scoring-as-a-service: kind-dispatched load, live parity,
    empty batch, fixed-batch chunking."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.models import define_C
    from pcgan_tpu.serving import (ServedComparator, export_comparator,
                                   load_exported)
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, cmp_nf=8, cmp_n_down=2))
    C = define_C(cfg)
    v = C.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)),
               train=False)
    export_comparator(cfg, v, str(tmp_path / "sym"), C=C)
    served = load_exported(str(tmp_path / "sym"))
    assert isinstance(served, ServedComparator)
    assert served.meta["kind"] == "comparator"

    imgs, _ = _rand_inputs(cfg, 5)
    mu, log_var = served(imgs)
    want_mu, want_lv = C.apply(v, jnp.asarray(imgs), train=False)
    np.testing.assert_allclose(mu, np.asarray(want_mu), atol=2e-5)
    np.testing.assert_allclose(log_var, np.asarray(want_lv), atol=2e-5)
    np.testing.assert_allclose(served.score(imgs), mu)

    mu0, lv0 = served(imgs[:0])
    assert mu0.shape == (0,) and lv0.shape == (0,)

    export_comparator(cfg, v, str(tmp_path / "fix"), C=C, fixed_batch=2)
    fixed = load_exported(str(tmp_path / "fix"))
    mu2, _ = fixed(imgs)                     # 5 -> 2 + 2 + padded 1
    np.testing.assert_allclose(mu2, np.asarray(want_mu), atol=2e-5)


def test_http_server_request_coalescing(tmp_path):
    """--batch_window_ms: concurrent requests fuse into fewer device
    dispatches, every caller still gets ITS rows back, and a malformed
    request 400s alone without poisoning the fused batch."""
    import concurrent.futures as cf
    import io
    import sys
    import threading
    import urllib.error
    import urllib.request
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from pcgan_tpu.serving import export_generator, load_exported

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, served = serve_http.make_server(str(tmp_path), "127.0.0.1", 0,
                                           batch_window_ms=150.0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    direct = load_exported(str(tmp_path))
    # warm the SERVER's artifact at the power-of-two bucket sizes fused
    # cohorts can land on, so no coalescing window stalls on a compile
    for b in (2, 4, 8, 16):
        served(*_rand_inputs(cfg, b))

    def post(i):
        imgs, cond = _rand_inputs(cfg, 1 + (i % 3), seed=i)
        buf = io.BytesIO()
        np.savez(buf, images=imgs, cond=cond)
        req = urllib.request.Request(f"{base}/generate", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return imgs, cond, np.load(io.BytesIO(r.read()))

    try:
        with cf.ThreadPoolExecutor(6) as ex:
            results = list(ex.map(post, range(6)))
        for imgs, cond, got in results:
            np.testing.assert_allclose(got, direct(imgs, cond), atol=1e-5)
        # 6 concurrent requests within the 150 ms window -> the batcher
        # must have fused at least some (strictly fewer dispatches)
        assert 0 < httpd.batcher.dispatches < 6

        bad = io.BytesIO()
        np.savez(bad, images=np.zeros((2, 8, 8, 3), np.float32),
                 cond=np.eye(4, dtype=np.float32)[:2])   # wrong H,W
        req = urllib.request.Request(f"{base}/generate", data=bad.getvalue(),
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_export_dir_kind_guard(tmp_path):
    """Exporting a different artifact kind into an existing export dir must
    refuse (overwriting meta.json orphans the other artifact); serve_http
    refuses non-generator artifacts at startup."""
    import dataclasses
    import sys
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.models import define_C
    from pcgan_tpu.serving import export_comparator, export_generator
    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    ccfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, cmp_nf=8, cmp_n_down=2))
    C = define_C(ccfg)
    cv = C.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)),
                train=False)
    with pytest.raises(ValueError, match="already holds a generator"):
        export_comparator(ccfg, cv, str(tmp_path), C=C)
    export_comparator(ccfg, cv, str(tmp_path / "cmp"), C=C)
    with pytest.raises(ValueError, match="already holds a comparator"):
        export_generator(cfg, v, str(tmp_path / "cmp"), G=G)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    with pytest.raises(ValueError, match="comparator artifact"):
        serve_http.make_server(str(tmp_path / "cmp"), "127.0.0.1", 0)


def test_unet_export_roundtrip(tmp_path):
    """Transposed convs under a SYMBOLIC batch dim: the unet family (4x4
    stride-2 deconvs + skip concats) exports and round-trips too."""
    import jax.numpy as jnp
    from pcgan_tpu.serving import export_generator, load_exported
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    cfg = Config(
        data=DataConfig(batch_size=2, crop_size=128, load_size=143,
                        n_age_bins=4),
        model=ModelConfig(netG="unet_128", ngf=4, ndf=4, dtype="float32"))
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    served = load_exported(str(tmp_path))
    for b in (1, 3):
        imgs, cond = _rand_inputs(cfg, b, seed=b)
        got = served(imgs, cond)
        want = np.asarray(G.apply(v, jnp.asarray(imgs), jnp.asarray(cond),
                                  train=False))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_http_server_hot_reload(tmp_path):
    """POST /reload hot-swaps the served artifact without a restart:
    traffic before/after resolves against the OLD/NEW module respectively,
    /healthz reflects the swap, and a bad path 400s leaving the old
    artifact serving. warmup_batch=1 exercises the pre-swap compile of the
    incoming module (the reload path warms BEFORE publishing so the first
    post-swap request never pays cold compile)."""
    import io
    import json as jsonlib
    import threading
    import urllib.error
    import urllib.request
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import jax
    import serve_http
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.serving import export_generator, load_exported
    import jax.numpy as jnp
    from pcgan_tpu.models import define_G

    cfg = _tiny_cfg()
    G, v1 = _init_g(cfg)
    v2 = init_params(G, jax.random.PRNGKey(99),
                     jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1, cfg.cond_nc)), train=False)
    export_generator(cfg, v1, str(tmp_path / "a"), G=G)
    export_generator(cfg, v2, str(tmp_path / "b"), G=G)

    httpd, _ = serve_http.make_server(str(tmp_path / "a"), "127.0.0.1", 0,
                                      warmup_batch=1)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    imgs, cond = _rand_inputs(cfg, 2)
    buf = io.BytesIO()
    np.savez(buf, images=imgs, cond=cond)
    payload = buf.getvalue()

    def generate():
        req = urllib.request.Request(f"{base}/generate", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return np.load(io.BytesIO(r.read()))

    try:
        want_a = load_exported(str(tmp_path / "a"))(imgs, cond)
        want_b = load_exported(str(tmp_path / "b"))(imgs, cond)
        np.testing.assert_allclose(generate(), want_a, atol=1e-6)

        body = jsonlib.dumps({"artifact_dir": str(tmp_path / "b")}).encode()
        req = urllib.request.Request(f"{base}/reload", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            rec = jsonlib.loads(r.read())
        assert rec["status"] == "reloaded"
        np.testing.assert_allclose(generate(), want_b, atol=1e-6)
        assert np.abs(want_a - want_b).max() > 1e-3   # the swap is visible

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = jsonlib.loads(r.read())
        assert health["artifact_dir"] == str(tmp_path / "b")

        bad = jsonlib.dumps({"artifact_dir": str(tmp_path / "nope")}).encode()
        req = urllib.request.Request(f"{base}/reload", data=bad,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        np.testing.assert_allclose(generate(), want_b, atol=1e-6)

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            st = jsonlib.loads(r.read())
        assert st["reloads"] == 1
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_server_prometheus_metrics(tmp_path):
    """GET /metrics: Prometheus text exposition of the same counters as
    /stats (scrape surface for production monitoring)."""
    import io
    import threading
    import urllib.request
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from pcgan_tpu.serving import export_generator

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, _ = serve_http.make_server(str(tmp_path), "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        imgs, cond = _rand_inputs(cfg, 2)
        buf = io.BytesIO()
        np.savez(buf, images=imgs, cond=cond)
        req = urllib.request.Request(f"{base}/generate", data=buf.getvalue(),
                                     method="POST")
        urllib.request.urlopen(req, timeout=120).read()
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        lines = dict(l.split(" ", 1) for l in text.strip().splitlines()
                     if not l.startswith("#"))
        assert lines["pcgan_requests_total"] == "1"
        assert lines["pcgan_rows_total"] == "2"
        assert lines["pcgan_errors_total"] == "0"
        assert lines["pcgan_reloads_total"] == "0"
        assert float(lines["pcgan_uptime_seconds"]) >= 0
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_image_endpoints(tmp_path):
    """Raw-image routes (/generate_image, /progression_image): JPEG/PNG in,
    PNG out, with the host doing the test-time transform (shorter-side
    resize + center crop). Value-pinned against the served module run on
    the same transform; condition/query errors 400."""
    import io
    import threading
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from PIL import Image
    from pcgan_tpu.client import ServingClient, ServingError
    from pcgan_tpu.serving import export_generator, load_exported

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, _ = serve_http.make_server(str(tmp_path), "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    raw = np.random.default_rng(0).integers(0, 256, (48, 40, 3),
                                            dtype=np.uint8)  # non-square
    buf = io.BytesIO()
    Image.fromarray(raw).save(buf, "PNG")
    png_in = buf.getvalue()
    nb, s = cfg.data.n_age_bins, cfg.data.crop_size
    try:
        c = ServingClient(f"http://127.0.0.1:{port}", timeout=120)
        out_png = c.generate_image(png_in, bin=2)
        img = Image.open(io.BytesIO(out_png))
        assert img.size == (s, s) and img.mode == "RGB"
        # value pin: the host's decode+transform is serve_http's own helper,
        # so the route must byte-match [transform -> served -> PNG-encode]
        served = load_exported(str(tmp_path))
        x = serve_http._decode_image_body(png_in, served.meta)
        want = serve_http._png_bytes(served(x, served.all_conditions()[2:3])[0])
        assert out_png == want

        strip_png = c.progression_image(png_in)
        strip = Image.open(io.BytesIO(strip_png))
        assert strip.size == ((nb + 1) * s, s)   # [input | nb aged tiles]

        for bad in (dict(score=0.5),   # score query on a onehot artifact
                    dict(bin=99)):     # out-of-range bin
            with pytest.raises(ServingError) as ei:
                c.generate_image(png_in, **bad)
            assert ei.value.status == 400
        with pytest.raises(ServingError) as ei:
            c.progression_image(b"this is not an image")
        assert ei.value.status == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_sweep_conditions_and_animation(tmp_path):
    """ServedGenerator.sweep_conditions matches the training-side
    interp_bins_onehot semantics (frames on a bin ARE the bin) and
    .animation's on-bin frames equal the progression grid's columns."""
    from pcgan_tpu.data.binning import interp_bins_onehot
    from pcgan_tpu.serving import export_generator, load_exported

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    srv = load_exported(str(tmp_path))
    nb = cfg.data.n_age_bins
    # n_frames = 2*(nb-1)+1 puts every other frame exactly on a bin
    t = 2 * (nb - 1) + 1
    sweep = srv.sweep_conditions(t)
    np.testing.assert_allclose(
        sweep, np.asarray(interp_bins_onehot(nb, t)), atol=1e-7)
    imgs = np.random.default_rng(0).uniform(
        -1, 1, (1, 32, 32, 3)).astype(np.float32)
    anim = srv.animation(imgs, t)
    grid = srv.progression(imgs)
    assert anim.shape == (1, t, 32, 32, 3)
    for b in range(nb):   # frame 2b sits exactly on bin b
        np.testing.assert_array_equal(anim[0, 2 * b], grid[0, b])
    with pytest.raises(ValueError, match="n_frames"):
        srv.sweep_conditions(1)
    # score-mode sweep: plain linspace column
    cfg_s = _tiny_cfg(cond_mode="score")
    G2, v2 = _init_g(cfg_s)
    d2 = str(tmp_path / "score")
    export_generator(cfg_s, v2, d2, G=G2)
    srv2 = load_exported(d2)
    np.testing.assert_allclose(
        srv2.sweep_conditions(5)[:, 0], np.linspace(-1, 1, 5), atol=1e-7)


def test_http_progression_gif(tmp_path):
    """/progression_gif: raw image in, looping animated GIF out with the
    requested frame count; bad frame counts 400."""
    import io
    import threading
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from PIL import Image
    from pcgan_tpu.client import ServingClient, ServingError
    from pcgan_tpu.serving import export_generator

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, _ = serve_http.make_server(str(tmp_path), "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    raw = np.random.default_rng(1).integers(0, 256, (40, 40, 3),
                                            dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(raw).save(buf, "PNG")
    png_in = buf.getvalue()
    try:
        c = ServingClient(f"http://127.0.0.1:{port}", timeout=120)
        gif = c.progression_gif(png_in, frames=6)
        im = Image.open(io.BytesIO(gif))
        assert im.format == "GIF" and getattr(im, "is_animated", False)
        assert im.n_frames == 6
        assert im.size == (cfg.data.crop_size, cfg.data.crop_size)
        assert im.info.get("loop", None) == 0   # loops forever
        for bad in (1, 1000):
            with pytest.raises(ServingError) as ei:
                c.progression_gif(png_in, frames=bad)
            assert ei.value.status == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_loadtest_tool_against_live_host(tmp_path):
    """tools/loadtest.py: the concurrent load generator drives a live
    coalescing host to completion — all requests OK, sane latency
    percentiles, and the device-dispatch delta visible (coalescing means
    dispatches <= requests)."""
    import sys
    import threading
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from loadtest import run_loadtest
    from pcgan_tpu.serving import export_generator

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, served = serve_http.make_server(str(tmp_path), "127.0.0.1", 0,
                                           batch_window_ms=5.0)
    # pre-compile the bucket sizes the fused cohorts will hit
    for b in (2, 4, 8):
        imgs, cond = _rand_inputs(cfg, b)
        served(imgs, cond)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        res = run_loadtest(f"http://127.0.0.1:{httpd.server_address[1]}",
                           concurrency=3, requests=6, batch=2, warmup=1)
    finally:
        httpd.shutdown()
        httpd.server_close()
    assert res["requests_err"] == 0
    assert res["requests_ok"] == 6
    assert res["p50_ms"] is not None and res["p50_ms"] > 0
    assert res["p99_ms"] >= res["p50_ms"]
    assert res["value"] > 0                       # rows/s
    # 6 timed requests (warmup excluded from the delta); coalescing can
    # only fuse, never split
    assert 1 <= res["device_dispatches"] <= 6
    assert res["batch_window_ms"] == 5.0


def test_http_server_auth_token(tmp_path):
    """--auth_token: every route except GET / and GET /healthz requires
    'Authorization: Bearer <token>'; the stdlib client sends it."""
    import io
    import json as jsonlib
    import threading
    import urllib.request
    import urllib.error
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve_http
    from pcgan_tpu.client import ServingClient, ServingError

    cfg = _tiny_cfg()
    G, v = _init_g(cfg)
    from pcgan_tpu.serving import export_generator
    export_generator(cfg, v, str(tmp_path), G=G)
    httpd, _ = serve_http.make_server(str(tmp_path), "127.0.0.1", 0,
                                      auth_token="sekrit")
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        # open routes: demo page + healthz (readiness probes)
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert jsonlib.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(f"{base}/", timeout=30) as r:
            assert r.status == 200

        # everything else 401s without (or with a wrong) token
        imgs, cond = _rand_inputs(cfg, 2)
        buf = io.BytesIO()
        np.savez(buf, images=imgs, cond=cond)
        for headers in ({}, {"Authorization": "Bearer wrong"},
                        {"Authorization": "sekrit"}):
            req = urllib.request.Request(f"{base}/generate",
                                         data=buf.getvalue(),
                                         headers=headers, method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/metrics", timeout=30)
        assert ei.value.code == 401

        # the client with the right token reaches every surface
        cl = ServingClient(base, auth_token="sekrit")
        out = cl.generate(imgs, cond)
        assert out.shape == imgs.shape
        assert "pcgan_requests_total" in cl.metrics()
        with pytest.raises(ServingError) as se:
            ServingClient(base, auth_token="nope").generate(imgs, cond)
        assert se.value.status == 401
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_server_watch_autoreload(tmp_path):
    """--watch_seconds: a re-export landing in the served artifact dir is
    picked up automatically (meta.json mtime is the commit marker) — the
    continuous-deployment loop needs no operator POST /reload."""
    import io
    import threading
    import time
    import urllib.request
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import jax
    import serve_http
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.serving import export_generator, load_exported
    import jax.numpy as jnp

    cfg = _tiny_cfg()
    G, v1 = _init_g(cfg)
    v2 = init_params(G, jax.random.PRNGKey(99),
                     jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1, cfg.cond_nc)), train=False)
    live = tmp_path / "live"
    export_generator(cfg, v1, str(live), G=G)

    httpd, _ = serve_http.make_server(str(live), "127.0.0.1", 0,
                                      watch_seconds=0.2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    imgs, cond = _rand_inputs(cfg, 2)
    buf = io.BytesIO()
    np.savez(buf, images=imgs, cond=cond)
    payload = buf.getvalue()

    def generate():
        req = urllib.request.Request(f"{base}/generate", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return np.load(io.BytesIO(r.read()))

    try:
        want_a = load_exported(str(live))(imgs, cond)
        np.testing.assert_allclose(generate(), want_a, atol=1e-6)

        export_generator(cfg, v2, str(live), G=G)   # re-export IN PLACE
        want_b = load_exported(str(live))(imgs, cond)
        assert np.abs(want_a - want_b).max() > 1e-3

        deadline = time.time() + 30
        while time.time() < deadline:
            if np.allclose(generate(), want_b, atol=1e-6):
                break
            time.sleep(0.2)
        else:
            raise AssertionError("watcher never swapped to the re-export")
    finally:
        httpd.watch_stop.set()
        httpd.shutdown()
        httpd.server_close()
