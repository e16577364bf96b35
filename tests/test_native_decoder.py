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


def test_native_stream_matches_python_range_images():
    """The native producer-thread stream must bin identically to the
    Python decode + build_range_image path, frame for frame."""
    import os

    import numpy as np
    import pytest

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import native_decoder, pcap, velodyne
    from bshot_slam_tpu.ops.rangeimage import build_range_image

    if not native_decoder.stream_available():
        pytest.skip("native library not built")
    cfg = default_config()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, sensor=dataclasses.replace(cfg.sensor, n_azimuth=512)
    )
    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden.pcap")

    payloads, _ = pcap.read_udp_payloads(path)
    sweeps = velodyne.sweeps_from_payloads(payloads, cfg.sensor)
    golds = [build_range_image(sw, cfg.sensor) for sw in sweeps]

    stream = native_decoder.NativeSweepStream(path, cfg.sensor)
    native = list(stream)
    # Python's sweep splitter drops partial first/last rotations the same
    # way the native stream does (both keyed on azimuth wrap), but counts
    # can differ by the leading partial — align on the common tail.
    assert len(native) >= len(golds)
    native = native[len(native) - len(golds):]
    for ri_n, ri_p in zip(native, golds):
        np.testing.assert_allclose(ri_n.range_mm, ri_p.range_mm, atol=1e-3)
        np.testing.assert_allclose(ri_n.azimuth_rad, ri_p.azimuth_rad,
                                   atol=1e-5)
        np.testing.assert_allclose(ri_n.vert_rad, ri_p.vert_rad, atol=1e-7)


def test_native_stream_skip_and_close():
    import os

    import pytest

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import native_decoder

    if not native_decoder.stream_available():
        pytest.skip("native library not built")
    import dataclasses

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, sensor=dataclasses.replace(cfg.sensor, n_azimuth=512)
    )
    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden.pcap")
    all_frames = list(native_decoder.NativeSweepStream(path, cfg.sensor))
    skipped = list(native_decoder.NativeSweepStream(path, cfg.sensor, skip=2))
    assert len(skipped) == len(all_frames) - 2
    # early close while the producer may still be ahead must not hang
    s = native_decoder.NativeSweepStream(path, cfg.sensor, queue=1)
    it = iter(s)
    next(it)
    s.close()
