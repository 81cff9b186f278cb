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
