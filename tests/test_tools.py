"""Smoke tests for the tools/ CLI drivers (the reference's test/ directory
of evaluation executables — SURVEY §4).  Each runs as a subprocess on CPU
with tiny synthetic inputs and must exit 0 with sane output."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")


def run_tool(name, *args, timeout=600):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, name), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


@pytest.mark.slow
def test_run_odometry_synthetic(tmp_path):
    out = tmp_path / "traj.txt"
    stdout = run_tool(
        "run_odometry.py", "--synthetic", "3", "--n-azimuth", "256",
        "--cpu", "--eval-corr", "--out", str(out),
    )
    assert "frame    2" in stdout
    assert "corr dist mm" in stdout
    assert len(out.read_text().strip().splitlines()) == 3


@pytest.mark.slow
def test_run_odometry_sharded_cli(tmp_path):
    """--sharded N drives the ENGINE over an N-virtual-device mesh from
    the CLI (SURVEY §7 phase 6; BASELINE configs 3-6 describe sharded
    sequence execution)."""
    out = tmp_path / "traj.txt"
    stdout = run_tool(
        "run_odometry.py", "--synthetic", "3", "--n-azimuth", "256",
        "--cpu", "--sharded", "4", "--out", str(out),
    )
    assert "engine sharded over 4 devices" in stdout
    assert "frame    2" in stdout
    assert len(out.read_text().strip().splitlines()) == 3


@pytest.mark.slow
def test_run_odometry_pipelined(tmp_path):
    """--pipeline defers diagnostics fetches; trajectory must still save
    every frame after the implicit flush."""
    out = tmp_path / "traj.txt"
    stdout = run_tool(
        "run_odometry.py", "--synthetic", "5", "--n-azimuth", "256",
        "--cpu", "--pipeline", "--out", str(out),
    )
    assert "5 frames" in stdout
    assert len(out.read_text().strip().splitlines()) == 5


@pytest.mark.slow
def test_run_preprocess_eval_synthetic(tmp_path):
    stdout = run_tool(
        "run_preprocess_eval.py", "--synthetic", "1", "--n-azimuth", "256",
        "--cpu", "--ply-out", str(tmp_path),
    )
    assert "keep" in stdout.lower() or "accuracy" in stdout.lower()
    assert any(p.suffix == ".ply" for p in tmp_path.iterdir())


def test_show_pointcloud_synthetic(tmp_path):
    stdout = run_tool(
        "show_pointcloud.py", "--synthetic", "1", "--n-azimuth", "128",
        "--out", str(tmp_path),
    )
    assert "returns" in stdout
    ply = tmp_path / "sweep_00000.ply"
    assert ply.exists() and "element vertex" in ply.read_text()[:200]


@pytest.mark.slow
def test_run_odometry_checkpoint_resume(tmp_path):
    """Checkpoint then resume carries the map, pose and trajectory forward
    (the reference has no state serialization at all — SURVEY §5)."""
    ck1, ck2 = tmp_path / "ck1", tmp_path / "ck2"
    t2 = tmp_path / "t2.txt"
    run_tool(
        "run_odometry.py", "--synthetic", "2", "--n-azimuth", "256", "--cpu",
        "--checkpoint", str(ck1),
    )
    stdout = run_tool(
        "run_odometry.py", "--synthetic", "2", "--n-azimuth", "256", "--cpu",
        "--resume", str(ck1), "--checkpoint", str(ck2), "--out", str(t2),
    )
    assert "resumed from" in stdout and "frame_idx=2" in stdout
    # prior 2 + new 2 poses in the combined trajectory and checkpoint
    assert len(t2.read_text().strip().splitlines()) == 4
    from bshot_slam_tpu.checkpoint import load_state

    state, poses = load_state(str(ck2))
    assert poses.shape[0] == 4 and int(state.frame_idx) == 4


@pytest.mark.slow
def test_run_odometry_live_udp(tmp_path):
    """Live-sensor mode: the driver ingests Velodyne datagrams off a UDP
    socket (reference: VelodyneCapture.h:315-408 + odometry_test main loop)."""
    import socket
    import subprocess
    import sys as _sys
    import threading
    import time

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import synthetic, velodyne

    # pick a free UDP port
    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    import dataclasses
    sensor = dataclasses.replace(default_config().sensor, n_azimuth=128)
    sweeps, _ = synthetic.render_sequence(3, sensor, seed=2, n_firings=128)
    pkts = velodyne.encode_packets(sweeps, sensor)

    out = tmp_path / "traj.txt"
    proc = subprocess.Popen(
        [_sys.executable, os.path.join(TOOLS, "run_odometry.py"),
         "--udp", str(port), "--udp-idle", "25", "--frames", "2",
         "--n-azimuth", "128", "--cpu", "--out", str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    stop = threading.Event()

    def feeder():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        while not stop.is_set():
            for p in pkts:
                tx.sendto(p.tobytes(), ("127.0.0.1", port))
                time.sleep(0.002)
        tx.close()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        stdout, _ = proc.communicate(timeout=540)
    finally:
        stop.set()
        proc.kill()
    assert proc.returncode == 0, stdout[-2000:]
    assert "frame    1" in stdout
    assert len(out.read_text().strip().splitlines()) == 2


@pytest.mark.slow
def test_run_odometry_live_view_and_step(tmp_path):
    """--live writes an atomic SVG/JSON/HTML view during the run; --step
    pauses per frame and 'c' releases it (stdin-driven, headless analog of
    odometry_test.cpp:339-386)."""
    live = tmp_path / "live"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "run_odometry.py"),
         "--synthetic", "3", "--n-azimuth", "256", "--cpu",
         "--live", str(live), "--live-every", "1", "--step"],
        capture_output=True, text=True, timeout=600, env=env,
        input="\nc\n",  # step once, then free-run
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "[step]" in proc.stdout
    svg = (live / "live.svg").read_text()
    assert "<svg" in svg and "polyline" in svg and "map keypoints" in svg
    assert (live / "live.html").exists()
    import json as _json

    stats = _json.loads((live / "live.json").read_text())
    assert stats["frame"] == 3
    assert stats["map_size"] > 0
    # Inlier correspondence segments are drawn (reference corrviewer,
    # odometry_test.cpp:281-345): the engine ran with keep_corr and at
    # least one matched frame rendered its pairs.
    assert stats["corr_drawn"] > 0
    assert "inlier correspondences" in svg and "<line" in svg
    # Rotatable 3D viewer (headless Viz3d replacement): page + payload.
    assert "orbit" in (live / "live3d.html").read_text().lower() or \
        "rotate" in (live / "live3d.html").read_text()
    p3 = _json.loads((live / "live_points.json").read_text())
    assert len(p3["traj"]) == 3 and len(p3["map"]) > 0
    assert len(p3["map"][0]) == 3 and p3["scale"] > 0
    assert p3["corr"] and len(p3["corr"][0]) == 2


@pytest.mark.slow
def test_run_odometry_adversarial_neighbor_cap(tmp_path):
    stdout = run_tool(
        "run_odometry.py", "--synthetic", "2", "--n-azimuth", "256",
        "--cpu", "--adversarial", "--neighbor-cap",
    )
    assert "frame    1" in stdout


@pytest.mark.slow
def test_run_pointpicking_html_picker(tmp_path):
    """--html embeds the exact frame points (base64 int16 cm) and the
    client-side crop-cube math matches the headless --box path."""
    import base64
    import json
    import re

    import numpy as np

    html_path = tmp_path / "picker.html"
    run_tool("run_pointpicking.py", "--synthetic", "1", "--n-azimuth", "256",
             "--html", str(html_path))
    html = html_path.read_text()
    assert "<canvas id='top'" in html and "<canvas id='side'" in html
    m = re.search(r"const frames = (\[.*?\]);", html, re.S)
    frames = json.loads(m.group(1))
    assert len(frames) == 1
    q = np.frombuffer(base64.b64decode(frames[0]["b64"]), np.int16)
    q = q.reshape(-1, 3).astype(np.float64) * 10.0  # cm -> mm
    assert q.shape[0] == frames[0]["n"]

    # Headless ground truth for one box.
    out = tmp_path / "sel.txt"
    box = ["-5000", "5000", "-5000", "5000", "-3000", "3000"]
    run_tool("run_pointpicking.py", "--synthetic", "1", "--n-azimuth", "256",
             "--box", *box, "--out", str(out))
    want = {int(t) for t in out.read_text().split()}

    # The JS selection math (inside box, skip 0,0,0 no-returns), in numpy.
    b = [float(v) for v in box]
    no_ret = np.all(q == 0, axis=1)
    sel = (
        (q[:, 0] >= b[0]) & (q[:, 0] <= b[1]) & (q[:, 1] >= b[2])
        & (q[:, 1] <= b[3]) & (q[:, 2] >= b[4]) & (q[:, 2] <= b[5])
        & ~no_ret
    )
    got = set(np.nonzero(sel)[0].tolist())
    # int16-cm quantization moves boundary points; demand near-identity.
    assert len(got ^ want) <= 0.02 * max(len(want), 1), (
        len(got), len(want), len(got ^ want))


@pytest.mark.slow
def test_run_odometry_pcap_native_stream(tmp_path):
    """PCAP ingest through the native producer-thread stream must drive the
    full pipeline and reproduce the golden trajectory."""
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    out = tmp_path / "traj.txt"
    stdout = run_tool(
        "run_odometry.py", os.path.join(fixtures, "golden.pcap"),
        "--n-azimuth", "512", "--cpu", "--frames", "4",
        "--out", str(out),
        "--gold", os.path.join(fixtures, "golden_traj.txt"),
    )
    assert "frame    3" in stdout
    assert "ATE RMSE" in stdout
