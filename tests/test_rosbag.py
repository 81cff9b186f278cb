"""Round-trip + replay tests for the pure-Python rosbag path (the
reference's `rosbag play` input, README.md:27-41)."""

import bz2
import struct

import numpy as np

from alego_tpu.utils import rosbag as rb


def _clouds(n=3, pts=50, seed=0):
    rng = np.random.default_rng(seed)
    return [(100.0 + 0.1 * k,
             rng.normal(size=(pts, 3)).astype(np.float32),
             rng.random(pts).astype(np.float32)) for k in range(n)]


def test_roundtrip_uncompressed(tmp_path):
    path = str(tmp_path / "t.bag")
    clouds = _clouds()
    rb.write_bag_pointclouds(path, clouds, topic="/lslidar_point_cloud")

    got = list(rb.read_bag_pointclouds(path))
    assert len(got) == 3
    for (t, topic, pc), (stamp, xyz, inten) in zip(got, clouds):
        assert topic == "/lslidar_point_cloud"
        assert abs(t - stamp) < 1e-6
        assert abs(pc.stamp - stamp) < 1e-6
        np.testing.assert_allclose(pc.array(("x", "y", "z")), xyz, rtol=1e-6)
        np.testing.assert_allclose(pc.array(("intensity",))[:, 0], inten,
                                   rtol=1e-6)


def test_topic_filter_and_info(tmp_path):
    path = str(tmp_path / "t.bag")
    rb.write_bag_pointclouds(path, _clouds(2), topic="/velodyne_points")
    assert list(rb.read_bag_pointclouds(path, topic="/other")) == []
    info = rb.bag_topics(path)
    assert info == {"/velodyne_points": (rb.PC2_TYPE, 2)}


def test_bz2_chunk(tmp_path):
    """Re-pack the writer's chunk with bz2 and confirm the reader
    decompresses it (rosbag record --bz2)."""
    path = str(tmp_path / "plain.bag")
    clouds = _clouds(2, seed=3)
    rb.write_bag_pointclouds(path, clouds)

    with open(path, "rb") as f:
        raw = f.read()
    # locate the chunk record after magic + bag header and re-compress it
    off = len(rb.MAGIC)
    (hlen,) = struct.unpack_from("<I", raw, off)
    (dlen,) = struct.unpack_from("<I", raw, off + 4 + hlen)
    off2 = off + 4 + hlen + 4 + dlen          # start of chunk record
    (chlen,) = struct.unpack_from("<I", raw, off2)
    chdr = rb._parse_header(raw[off2 + 4: off2 + 4 + chlen])
    (cdlen,) = struct.unpack_from("<I", raw, off2 + 4 + chlen)
    blob = raw[off2 + 4 + chlen + 4: off2 + 4 + chlen + 4 + cdlen]
    packed = rb._record({"op": bytes([rb.OP_CHUNK]), "compression": b"bz2",
                         "size": chdr["size"]}, bz2.compress(blob))
    path2 = str(tmp_path / "bz2.bag")
    with open(path2, "wb") as f:
        f.write(raw[:off2] + packed)

    got = list(rb.read_bag_pointclouds(path2))
    assert len(got) == 2
    np.testing.assert_allclose(got[1][2].array(), clouds[1][1], rtol=1e-6)


def test_cli_bag_replay(tmp_path):
    """End-to-end: render a few synthetic scans, pack them into a bag, and
    run the CLI replay path on it."""
    from alego_tpu.config import tiny_config
    from alego_tpu.utils import synthetic
    from alego_tpu import cli

    cfg = tiny_config()
    poses = synthetic.loop_trajectory(4, radius=25.0, speed=0.5, closed=False)
    world = synthetic.make_world(seed=11, clear_path=poses[:, :2, 3])
    pts, mask = synthetic.render_sequence(world, poses, cfg, noise=0.01)
    clouds = [(10.0 + 0.2 * k, pts[k][mask[k]]) for k in range(4)]
    bag = str(tmp_path / "seq.bag")
    rb.write_bag_pointclouds(bag, clouds)

    out = str(tmp_path / "out")
    rc = cli.main(["--bag", bag, "--tiny", "--no-loop-closure",
                   "--output", out])
    assert rc == 0
    traj = np.loadtxt(out + "/trajectory_tum.txt")
    assert traj.shape == (4, 8)
    assert np.isfinite(traj).all()


def test_imu_roundtrip(tmp_path):
    """sensor_msgs/Imu write -> parse roundtrip, interleaved with clouds
    (the reference's /imu/data bag input, utility.h:68)."""
    import numpy as np
    from alego_tpu.utils.rosbag import (write_bag_pointclouds,
                                        read_bag_messages, bag_topics,
                                        IMU_TYPE, PC2_TYPE)

    rng = np.random.default_rng(0)
    clouds = [(0.1, rng.normal(size=(50, 3)).astype(np.float32)),
              (0.3, rng.normal(size=(40, 3)).astype(np.float32))]
    imu = [(0.05, (0.01, -0.02, 0.5), (0.1, 0.2, 9.9)),
           (0.15, (0.0, 0.0, 0.6), (0.0, 0.0, 9.81), (0.0, 0.0, 0.5)),
           (0.25, (0.02, 0.01, 0.7), (-0.1, 0.1, 9.7))]
    path = str(tmp_path / "mix.bag")
    write_bag_pointclouds(path, clouds, topic="/pc", imu=imu)

    topics = bag_topics(path)
    assert topics["/pc"] == (PC2_TYPE, 2)
    assert topics["/imu/data"] == (IMU_TYPE, 3)

    got_pc, got_imu = [], []
    for t, topic, mtype, msg in read_bag_messages(path):
        (got_imu if mtype == IMU_TYPE else got_pc).append(msg)
    assert len(got_pc) == 2 and len(got_imu) == 3
    # stamp order preserved (interleaved by time)
    m = got_imu[1]
    assert abs(m.stamp - 0.15) < 1e-6
    np.testing.assert_allclose(m.rpy(), [0.0, 0.0, 0.6], atol=1e-9)
    np.testing.assert_allclose(m.lin_acc, [0.0, 0.0, 9.81])
    np.testing.assert_allclose(m.ang_vel, [0.0, 0.0, 0.5])
    np.testing.assert_allclose(got_imu[0].rpy(), [0.01, -0.02, 0.5],
                               atol=1e-9)
