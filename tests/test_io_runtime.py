import numpy as np
import pytest

from alego_tpu.utils import io as pio
from alego_tpu.runtime import io_native


def test_pcd_roundtrip_python(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (1234, 4)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    pio.write_pcd(p, pts)
    back = pio.read_pcd_py(p)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_pcd_ascii(tmp_path):
    pts = np.array([[1.5, 2.5, 3.5], [4, 5, 6]], np.float32)
    p = str(tmp_path / "a.pcd")
    pio.write_pcd(p, pts, binary=False)
    back = pio.read_pcd_py(p)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_native_build_and_roundtrip(tmp_path):
    if not io_native.native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    pts = rng.uniform(-50, 50, (999, 4)).astype(np.float32)
    p = str(tmp_path / "n.pcd")
    assert io_native.native_write_pcd(p, pts)
    back = io_native.native_read_pcd(p)
    np.testing.assert_allclose(back, pts, rtol=1e-6)
    # python reader reads native-written files too
    back2 = pio.read_pcd_py(p)
    np.testing.assert_allclose(back2, pts, rtol=1e-6)


def test_frame_loader_prefetch(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    truth = []
    for k in range(6):
        pts = rng.uniform(-10, 10, (100 + k, 4)).astype(np.float32)
        p = str(tmp_path / f"{k:03d}.bin")
        pts.tofile(p)
        paths.append(p)
        truth.append(pts)
    loader = io_native.FrameLoader(paths, n_threads=3, queue_cap=2)
    for k, frame in enumerate(loader):
        np.testing.assert_allclose(frame, truth[k], rtol=1e-6)
    loader.close()


def test_save_map(tmp_path):
    kp = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    d = {"keyposes": kp,
         "corner": np.zeros((10, 3), np.float32),
         "surf": np.ones((20, 3), np.float32),
         "outlier": np.zeros((5, 3), np.float32)}
    pio.save_map(str(tmp_path / "map"), d)
    surf = pio.read_pcd(str(tmp_path / "map" / "surf.pcd"))
    assert surf.shape == (20, 3)
