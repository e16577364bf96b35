"""Native decoder vs pure-python decoder cross-validation."""

import subprocess

import numpy as np
import pytest

from bshot_slam_tpu.config import SensorConfig
from bshot_slam_tpu.io import native_decoder, pcap, synthetic, velodyne
from bshot_slam_tpu.ops.rangeimage import build_range_image


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", "native", "-s"], check=True, cwd="/root/repo")
    assert native_decoder.is_available()


def _write_capture(tmp_path, n_frames=3, n_az=96):
    sensor = SensorConfig(n_azimuth=n_az)
    sweeps, _ = synthetic.render_sequence(n_frames, sensor, seed=5, n_firings=n_az)
    payloads = velodyne.encode_packets(sweeps, sensor)
    path = str(tmp_path / "cap.pcap")
    pcap.write_udp_payloads(path, payloads)
    return path, sensor


def test_native_matches_python(tmp_path):
    path, sensor = _write_capture(tmp_path)
    native = native_decoder.decode_pcap_native(path, sensor)
    payloads, _ = pcap.read_udp_payloads(path)
    python = velodyne.sweeps_from_payloads(payloads, sensor)
    assert native is not None
    assert len(native) == len(python)
    for a, b in zip(native, python):
        ra = build_range_image(a, sensor)
        rb = build_range_image(b, sensor)
        np.testing.assert_allclose(ra.range_mm, rb.range_mm)
        np.testing.assert_allclose(ra.azimuth_rad, rb.azimuth_rad, atol=1e-6)


def test_native_skip(tmp_path):
    path, sensor = _write_capture(tmp_path)
    all_sweeps = native_decoder.decode_pcap_native(path, sensor)
    skipped = native_decoder.decode_pcap_native(path, sensor, skip=1)
    assert len(skipped) == len(all_sweeps) - 1
    np.testing.assert_array_equal(skipped[0].distance, all_sweeps[1].distance)


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.pcap"
    bad.write_bytes(b"not a pcap file at all")
    assert native_decoder.decode_pcap_native(str(bad), SensorConfig()) is None
