"""--tb_logdir: TensorBoard event-file mirroring of metrics.jsonl scalars
(utils/tb_writer.py — stdlib tfevents encoder; SURVEY.md SS6 observability
row, C13 visualizer family).

Validation layers: CRC32C against published vectors, TFRecord framing
checked byte-level, Event protos parsed back with tensorboard's own proto
(skipped when tensorboard is absent), and a CLI train run whose event
file must carry the same scalars as its metrics.jsonl.
"""

import json
import os
import struct
import subprocess
import sys

import pytest

from pcgan_tpu.utils.tb_writer import TBWriter, _masked_crc, crc32c


def test_crc32c_vectors():
    # RFC 3720 / published Castagnoli vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(bytes(32)) == 0x8A9136AA


def _parse_records(path):
    """Minimal TFRecord reader: verifies both masked CRCs per record."""
    data = open(path, "rb").read()
    records, off = [], 0
    while off < len(data):
        hdr = data[off:off + 8]
        (n,) = struct.unpack("<Q", hdr)
        (hcrc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hcrc == _masked_crc(hdr)
        payload = data[off + 12:off + 12 + n]
        (dcrc,) = struct.unpack("<I", data[off + 12 + n:off + 16 + n])
        assert dcrc == _masked_crc(payload)
        records.append(payload)
        off += 16 + n
    return records


def test_framing_and_protos(tmp_path):
    w = TBWriter(str(tmp_path / "run"))
    w.add_scalars(3, {"loss_G": 0.5, "loss_D": -0.25}, wall_time=123.0)
    w.add_scalars(7, {"loss_G": 0.125})
    w.add_scalars(9, {})          # empty dict: no record written
    w.close()
    recs = _parse_records(w.path)
    assert len(recs) == 3         # file_version + 2 scalar events

    ev = pytest.importorskip(
        "tensorboard.compat.proto.event_pb2", reason="tensorboard absent")
    first = ev.Event.FromString(recs[0])
    assert first.file_version == "brain.Event:2"
    e1 = ev.Event.FromString(recs[1])
    assert e1.step == 3 and e1.wall_time == 123.0
    got = {v.tag: v.simple_value for v in e1.summary.value}
    assert got == {"loss_G": 0.5, "loss_D": -0.25}
    e2 = ev.Event.FromString(recs[2])
    assert e2.step == 7
    assert {v.tag: v.simple_value for v in e2.summary.value} == \
        {"loss_G": 0.125}


@pytest.mark.slow
def test_train_cli_mirrors_metrics(tmp_path):
    ev = pytest.importorskip(
        "tensorboard.compat.proto.event_pb2", reason="tensorboard absent")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    train_py = os.path.join(os.path.dirname(__file__), "..", "train.py")
    # a free port for the profiler server (ADVICE r3: a hardcoded port
    # flakes under parallel pytest runs / leftover processes)
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        prof_port = s.getsockname()[1]
    p = subprocess.run(
        [sys.executable, train_py,
         "--dataset_mode", "synthetic", "--max_dataset_size", "8",
         "--crop_size", "32", "--load_size", "32", "--batch_size", "4",
         "--n_age_bins", "4", "--netG", "resnet_6blocks", "--ngf", "8",
         "--ndf", "8", "--dtype", "float32", "--niter", "1",
         "--niter_decay", "0", "--print_freq", "1", "--save_epoch_freq", "0",
         "--mesh_shape", "1", "--name", "tb",
         "--checkpoints_dir", str(tmp_path),
         "--tb_logdir", str(tmp_path / "tb_events"),
         "--log_grad_norm", "--log_memory",
         "--profile_server", str(prof_port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=600)
    assert p.returncode == 0, p.stdout
    assert f"profiler server on :{prof_port}" in p.stdout

    run_dir = tmp_path / "tb_events" / "tb"
    files = [f for f in os.listdir(run_dir)
             if f.startswith("events.out.tfevents.")]
    assert len(files) == 1
    events = {}
    for rec in _parse_records(str(run_dir / files[0]))[1:]:
        e = ev.Event.FromString(rec)
        events.setdefault(e.step, {}).update(
            {v.tag: v.simple_value for v in e.summary.value})

    n_checked = 0
    saw_grad_norm = False
    with open(tmp_path / "tb" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            step = rec["step"]
            assert step in events
            for k, v in rec.items():
                if k in ("step", "epoch", "wall_s", "imgs_per_sec"):
                    continue
                assert events[step][k] == pytest.approx(v, rel=1e-6), \
                    (step, k)
                n_checked += 1
                if k == "grad_norm_G":
                    saw_grad_norm = v > 0
            # --log_memory is a documented NO-OP on backends without
            # memory stats (CPU returns None): keys must be absent here
            assert "mem_hbm_gb" not in rec
    assert n_checked >= 4
    assert saw_grad_norm    # --log_grad_norm streams through the CLI + TB
