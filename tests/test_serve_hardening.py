"""Serving-host hardening (VERDICT r3 weak #3 + ADVICE r3 findings):
oversized bodies 413 without buffering, slow-body sockets disconnect at
--request_timeout, the in-flight queue is bounded (503 load shedding),
decompression-bomb images reject on DECLARED dimensions, 401s keep the
keep-alive connection framed (body drained first), /healthz redacts
artifact meta when auth is on, and concurrent _swap calls serialize.
`tools/loadtest.py --abuse` drives the same battery against any live host.
"""

from __future__ import annotations

import http.client
import io
import json
import os
import socket
import sys
import threading
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _tiny_cfg():
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    return Config(
        data=DataConfig(batch_size=2, crop_size=32, load_size=36,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32", cond_inject="bottleneck"))


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.serving import export_generator
    cfg = _tiny_cfg()
    G = define_G(cfg)
    v = init_params(G, jax.random.PRNGKey(7),
                    jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                    train=False)
    d = tmp_path_factory.mktemp("artifact")
    export_generator(cfg, v, str(d), G=G)
    return str(d)


def _boot(artifact_dir, **kw):
    import serve_http
    httpd, _ = serve_http.make_server(artifact_dir, "127.0.0.1", 0, **kw)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1]


def _npz_body(b=2, s=32, nb=4):
    buf = io.BytesIO()
    np.savez(buf, images=np.zeros((b, s, s, 3), np.float32),
             cond=np.eye(nb, dtype=np.float32)[:b])
    return buf.getvalue()


def _post(port, path, body, token=None, headers=()):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    c.putrequest("POST", path)
    if token:
        c.putheader("Authorization", f"Bearer {token}")
    for k, v in headers:
        c.putheader(k, v)
    if not any(k == "Content-Length" for k, _ in headers):
        c.putheader("Content-Length", str(len(body)))
    c.endheaders()
    if body:
        c.send(body)
    r = c.getresponse()
    return c, r, r.read()


def test_oversized_body_413_without_reading(artifact_dir):
    httpd, port = _boot(artifact_dir, max_body_bytes=1 << 20)
    try:
        # declare 1 TiB, send nothing: the reply must come back immediately
        # (the server must NOT wait for — or buffer — the body)
        t0 = time.perf_counter()
        c, r, body = _post(port, "/generate", b"",
                           headers=(("Content-Length", str(1 << 40)),))
        assert r.status == 413
        assert b"max_body_bytes" in body
        assert time.perf_counter() - t0 < 10
        assert r.getheader("Connection") == "close"
        c.close()
        # host still healthy
        c, r, body = _post(port, "/generate", _npz_body())
        assert r.status == 200
        c.close()
        st = json.loads(_get(port, "/stats")[2])
        assert st["rejected"] >= 1
    finally:
        httpd.shutdown()


def _get(port, path, token=None):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    c.putrequest("GET", path)
    if token:
        c.putheader("Authorization", f"Bearer {token}")
    c.endheaders()
    r = c.getresponse()
    return c, r, r.read()


def test_invalid_content_length_400(artifact_dir):
    httpd, port = _boot(artifact_dir)
    try:
        c, r, _ = _post(port, "/generate", b"",
                        headers=(("Content-Length", "banana"),))
        assert r.status == 400
        c.close()
    finally:
        httpd.shutdown()


def test_max_pending_bound_503(artifact_dir):
    # max_pending=0: every POST sheds deterministically — validates the
    # bound exists and surfaces as 503 + the rejected counter
    httpd, port = _boot(artifact_dir, max_pending=0)
    try:
        c, r, body = _post(port, "/generate", _npz_body())
        assert r.status == 503
        assert b"busy" in body
        c.close()
        st = json.loads(_get(port, "/stats")[2])
        assert st["rejected"] >= 1
    finally:
        httpd.shutdown()


def test_slow_body_disconnects_at_timeout(artifact_dir):
    httpd, port = _boot(artifact_dir, request_timeout=1.0)
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=15)
        s.sendall(b"POST /generate HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 100000\r\n\r\n" + b"x" * 10)
        t0 = time.perf_counter()
        s.settimeout(15)
        data = s.recv(65536)     # server times out reading -> closes
        dt = time.perf_counter() - t0
        assert data == b"", data  # closed without a response
        assert dt < 10, dt
        s.close()
        # the handler thread is free again; host serves
        c, r, _ = _post(port, "/generate", _npz_body())
        assert r.status == 200
        c.close()
    finally:
        httpd.shutdown()


def test_bomb_image_rejected_on_declared_dims(artifact_dir):
    pytest.importorskip("PIL")
    from loadtest import _bomb_png
    httpd, port = _boot(artifact_dir)
    try:
        c, r, body = _post(port, "/generate_image?bin=0", _bomb_png())
        assert r.status == 400
        assert b"exceed" in body
        c.close()
    finally:
        httpd.shutdown()


def test_wrong_token_401_keeps_connection_framed(artifact_dir):
    httpd, port = _boot(artifact_dir, auth_token="s3cret")
    try:
        # 401 with an unread body used to desync keep-alive framing
        # (ADVICE r3): the drained connection must serve the NEXT request
        c, r, _ = _post(port, "/generate", b"y" * 8192, token="wrong")
        assert r.status == 401
        c.putrequest("GET", "/healthz")
        c.putheader("Authorization", "Bearer s3cret")
        c.endheaders()
        r2 = c.getresponse()
        body2 = json.loads(r2.read())
        assert r2.status == 200 and body2["status"] == "ok"
        assert "meta" in body2          # token sent -> full body
        c.close()
    finally:
        httpd.shutdown()


def test_healthz_redacted_under_auth(artifact_dir):
    httpd, port = _boot(artifact_dir, auth_token="s3cret")
    try:
        c, r, body = _get(port, "/healthz")
        got = json.loads(body)
        assert r.status == 200 and got == {"status": "ok"}, got
        c.close()
        c, r, body = _get(port, "/healthz", token="s3cret")
        got = json.loads(body)
        assert "meta" in got and "artifact_dir" in got
        c.close()
    finally:
        httpd.shutdown()


def test_abuse_battery_tool(artifact_dir):
    """tools/loadtest.py --abuse: the CLI battery passes end-to-end
    against a hardened live host (auth on, small body cap)."""
    from loadtest import run_abuse
    httpd, port = _boot(artifact_dir, auth_token="tok",
                        max_body_bytes=1 << 20, request_timeout=2.0)
    try:
        res = run_abuse(f"http://127.0.0.1:{port}", auth_token="tok",
                        timeout=30, slow_wait=3.0)
        assert res["failed"] == [], res
        # every case actually ran (incl. the opt-in slow-body one)
        for case in ("oversized_body_413", "garbage_npz_400",
                     "bomb_image_400", "wrong_token_401_keepalive",
                     "slow_body_disconnected", "host_alive_after_abuse"):
            assert case in res["cases"], case
    finally:
        httpd.shutdown()


def test_concurrent_swap_serialized(artifact_dir, monkeypatch):
    """Two racing _swap calls (watcher + /reload) must serialize: the
    loads run one at a time (ADVICE r3)."""
    import serve_http
    httpd, port = _boot(artifact_dir)
    try:
        inside = {"now": 0, "max": 0}
        gate = threading.Lock()
        orig_load = httpd.current["served"].__class__
        from pcgan_tpu import serving as serving_mod
        real = serving_mod.load_exported

        def tracked(path):
            with gate:
                inside["now"] += 1
                inside["max"] = max(inside["max"], inside["now"])
            time.sleep(0.2)
            out = real(path)
            with gate:
                inside["now"] -= 1
            return out

        monkeypatch.setattr(serving_mod, "load_exported", tracked)
        # rebuild a server AFTER the patch so make_server binds tracked
        httpd2, port2 = _boot(artifact_dir)
        try:
            def reload_once():
                c, r, _ = _post(port2, "/reload", b"")
                assert r.status == 200
                c.close()
            ts = [threading.Thread(target=reload_once) for _ in range(3)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert inside["max"] == 1, inside
        finally:
            httpd2.shutdown()
    finally:
        httpd.shutdown()


def test_wrong_token_large_body_closes_without_draining(artifact_dir):
    """ADVICE r4 low: a tokenless client declaring a large body must not
    cost the host the read — past the 1 MiB drain cap the 401 closes the
    connection immediately instead of consuming up to max_body_bytes."""
    import serve_http
    httpd, port = _boot(artifact_dir, auth_token="s3cret",
                        request_timeout=30.0)
    try:
        # declare 2 MiB (over the cap, under max_body_bytes) but send
        # nothing: with a drain the server would block on the absent body
        # until request_timeout; the capped path replies at once
        t0 = time.perf_counter()
        c, r, body = _post(
            port, "/generate", b"", token="wrong",
            headers=(("Content-Length",
                      str(serve_http._REJECT_DRAIN_CAP + (1 << 20))),))
        assert r.status == 401
        assert r.getheader("Connection") == "close"
        assert time.perf_counter() - t0 < 10
        c.close()
        # host still healthy on a fresh connection
        c, r, _ = _post(port, "/generate", _npz_body(), token="s3cret")
        assert r.status == 200
        c.close()
    finally:
        httpd.shutdown()
