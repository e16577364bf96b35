import numpy as np

from bshot_slam_tpu.config import SensorConfig, VLP16_SENSOR
from bshot_slam_tpu.io import pcap, synthetic, velodyne
from bshot_slam_tpu.ops.rangeimage import build_range_image


def small_sensor():
    return SensorConfig(n_azimuth=128)


def test_packet_roundtrip():
    sensor = SensorConfig(n_azimuth=64)
    scene = synthetic.default_scene(0)
    pose = synthetic.straight_trajectory(1)[0]
    sweep = synthetic.render_sweep(scene, sensor, pose, n_firings=64)
    payloads = velodyne.encode_packets([sweep, sweep], sensor)
    assert payloads.shape[1] == velodyne.PACKET_SIZE
    sweeps = velodyne.sweeps_from_payloads(payloads, sensor)
    # First decoded sweep must match the rendered one (2nd is the tail, dropped).
    assert len(sweeps) >= 1
    got = sweeps[0]
    # Compare via range-image binning (firing order may legally differ).
    ri_a = build_range_image(sweep, sensor)
    ri_b = build_range_image(got, sensor)
    np.testing.assert_allclose(ri_b.range_mm, ri_a.range_mm, atol=1e-3)


def test_pcap_roundtrip(tmp_path):
    sensor = SensorConfig(n_azimuth=64)
    scene = synthetic.default_scene(1)
    pose = synthetic.straight_trajectory(1)[0]
    sweep = synthetic.render_sweep(scene, sensor, pose, n_firings=64)
    payloads = velodyne.encode_packets([sweep], sensor)
    path = str(tmp_path / "test.pcap")
    pcap.write_udp_payloads(path, payloads)
    back, ts = pcap.read_udp_payloads(path)
    np.testing.assert_array_equal(back, payloads)
    assert ts.shape[0] == payloads.shape[0]


def test_sweep_split_boundaries():
    az = np.array([10.0, 200.0, 350.0, 5.0, 180.0, 355.0, 2.0])
    ring = np.zeros(7, np.int32)
    dist = np.arange(7, dtype=np.uint16)
    inten = np.zeros(7, np.uint8)
    sweeps = velodyne.split_sweeps(az, ring, dist, inten)
    assert len(sweeps) == 2
    assert len(sweeps[0]) == 3 and len(sweeps[1]) == 3


def test_vlp16_azimuth_interpolation():
    # Two firing sequences per block: lasers >= 16 get the half-step azimuth.
    payload = np.zeros((1, velodyne.PACKET_SIZE), np.uint8)
    pkt = payload.view(velodyne._PACKET_DTYPE).reshape(1)
    for f in range(velodyne.FIRING_PER_PKT):
        pkt[0]["firings"][f]["azimuth"] = 1000 + 40 * f  # 0.4 deg per block
        pkt[0]["firings"][f]["returns"]["distance"] = 500
    pkt[0]["sensor_type"] = velodyne.SENSOR_VLP16
    az, ring, dist, inten = velodyne.decode_packets(payload, VLP16_SENSOR)
    az0 = az[: velodyne.LASER_PER_FIRING]
    assert np.allclose(az0[:16], 10.0)
    assert np.allclose(az0[16:], 10.2)  # +half of 0.4 deg
    assert (ring[:32] == np.arange(32) % 16).all()


def test_range_image_binning():
    sensor = small_sensor()
    sweep = velodyne.LaserSweep(
        azimuth_deg=np.array([0.1, 90.0, 180.0]),
        ring=np.array([0, 1, 31], np.int32),  # firing-order ids
        distance=np.array([1000, 2000, 3000], np.uint16),
        intensity=np.zeros(3, np.uint8),
    )
    ri = build_range_image(sweep, sensor)
    vert = np.asarray(sensor.vertical_angles_deg)
    row0 = np.searchsorted(np.sort(vert), vert[0])
    row1 = np.searchsorted(np.sort(vert), vert[1])
    row31 = np.searchsorted(np.sort(vert), vert[31])
    assert ri.range_mm[row0, 0] == 2000.0  # 1000 ticks * 2 mm
    assert ri.range_mm[row1, 32] == 4000.0
    assert ri.range_mm[row31, 64] == 6000.0
    # exact azimuth preserved
    assert np.isclose(ri.azimuth_rad[row0, 0], np.deg2rad(0.1))


def test_synthetic_ground_distance():
    # Straight down-looking rays must hit ground at H / sin(|v|).
    sensor = SensorConfig(n_azimuth=32)
    scene = synthetic.Scene(boxes=[])
    pose = synthetic.straight_trajectory(1)[0]
    sweep = synthetic.render_sweep(scene, sensor, pose, n_firings=32)
    ri = build_range_image(sweep, sensor)
    v = ri.vert_rad
    with np.errstate(divide="ignore"):
        expect = np.where(v < 0, 2450.0 / np.maximum(np.abs(np.sin(v)), 1e-12), 0.0)
    expect = np.where(expect >= synthetic.MAX_RANGE_MM, 0.0, expect)
    got = ri.range_mm[:, 5]
    np.testing.assert_allclose(got, expect, rtol=5e-3)


def test_udp_capture_loopback():
    """Live UDP path (reference: VelodyneCapture.h:315-408): datagrams in,
    complete sweeps out of the queue; incomplete tail never emitted."""
    import socket
    import time

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import synthetic, velodyne
    from bshot_slam_tpu.io.udp import UdpCapture

    sensor = default_config().sensor
    sweeps, _ = synthetic.render_sequence(3, sensor, seed=2, n_firings=96)
    pkts = velodyne.encode_packets(sweeps, sensor)

    cap = UdpCapture(sensor, address="127.0.0.1", port=0,
                     packets_per_batch=4)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for p in pkts:
            tx.sendto(p.tobytes(), ("127.0.0.1", cap.port))
            time.sleep(0.001)
        tx.close()
        got = []
        deadline = time.time() + 10.0
        while len(got) < 2 and time.time() < deadline:
            sw = cap.retrieve(timeout=0.2)
            if sw is not None:
                got.append(sw)
        # 3 rotations sent; the last is an undelimited tail, so >= 2 arrive.
        assert len(got) >= 2
        for sw in got:
            assert len(sw.azimuth_deg) > 0
            assert (np.diff(sw.azimuth_deg) >= 0).all()  # one clean rotation
        assert cap.is_run()
    finally:
        cap.close()
    assert not cap.is_run()


def test_corrupt_pcap_inputs_fail_gracefully(tmp_path):
    """Garbage, truncated, and wrong-magic captures must raise/return
    cleanly in both the Python and native paths (never crash or hang)."""
    import pytest

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import native_decoder, pcap

    cfg = default_config()
    garbage = tmp_path / "garbage.pcap"
    garbage.write_bytes(b"this is not a pcap file at all, sorry" * 10)
    trunc = tmp_path / "trunc.pcap"
    # full 24-byte global header, zero records
    trunc.write_bytes(b"\xd4\xc3\xb2\xa1" + b"\x00" * 20)
    empty = tmp_path / "empty.pcap"
    empty.write_bytes(b"")

    # Graceful = zero payloads or a clean exception, never a crash/hang.
    for p in (garbage, empty, trunc):
        try:
            payloads, _ = pcap.read_udp_payloads(str(p))
            assert len(payloads) == 0, p
        except Exception:
            pass

    if native_decoder.is_available():
        for p in (garbage, empty, trunc):
            out = native_decoder.decode_pcap_native(str(p), cfg.sensor)
            assert out is None or out == []
    if native_decoder.stream_available():
        import pytest as _pytest

        for p in (garbage, empty):
            with _pytest.raises(RuntimeError):
                native_decoder.NativeSweepStream(str(p), cfg.sensor)
        # truncated-after-magic: opens, yields nothing, closes cleanly
        s = native_decoder.NativeSweepStream(str(trunc), cfg.sensor)
        assert list(s) == []


def test_encode_sensor_byte_by_ring_count():
    """encode_packets must stamp the factory byte from the sensor's ring
    count, not object identity: a customized (non-singleton) VLP-16 config
    previously round-tripped to ZERO points because decode's sensor gate
    keyed on n_rings while encode compared `sensor is VLP16_SENSOR`."""
    import dataclasses

    sensor = dataclasses.replace(VLP16_SENSOR, n_azimuth=256)
    sweep = velodyne.LaserSweep(
        azimuth_deg=np.array([10.0, 20.0, 30.0]),
        ring=np.array([0, 1, 2], np.int32),
        distance=np.array([500, 600, 700], np.uint16),
        intensity=np.array([1, 2, 3], np.uint8),
    )
    payloads = velodyne.encode_packets([sweep, sweep], sensor)
    pk = payloads.view(velodyne._PACKET_DTYPE).reshape(-1)
    assert (pk["sensor_type"] == velodyne.SENSOR_VLP16).all()
    az, ring, dist, _ = velodyne.decode_packets(payloads, sensor)
    # Both sweeps' returns survive the gate (encode pads short packets
    # with copies of the last firing, so >= not ==).
    assert (dist > 0).sum() >= 6


def test_corrupt_lead_firing_does_not_skew_vlp16_interpolation():
    """A gated-out firing 0 must not poison the packet's VLP-16 half-step
    interpolation (d01): previously az_raw[0]=40000 made d01 negative and
    pushed surviving second-sequence lasers to negative azimuths."""
    payload = np.zeros((1, velodyne.PACKET_SIZE), np.uint8)
    pkt = payload.view(velodyne._PACKET_DTYPE).reshape(1)
    for f in range(velodyne.FIRING_PER_PKT):
        pkt[0]["firings"][f]["azimuth"] = 1000 + 40 * f
        pkt[0]["firings"][f]["returns"]["distance"] = 500
    pkt[0]["firings"][0]["azimuth"] = 40000  # corrupt: gated out
    pkt[0]["sensor_type"] = velodyne.SENSOR_VLP16
    az, ring, dist, _ = velodyne.decode_packets(payload, VLP16_SENSOR)
    assert (az >= 0).all() and (az < 360).all()
    # The corrupt firing's 32 lasers are gone; the rest survive with their
    # raw azimuths (d01 fell back to 0 for this packet).
    assert az.shape[0] == (velodyne.FIRING_PER_PKT - 1) * 32
    assert np.isclose(az.min(), 10.4)
