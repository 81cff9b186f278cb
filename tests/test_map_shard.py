"""Spatially-sharded map KNN must agree with the single-device search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alego_tpu.parallel.multichip import make_mesh
from alego_tpu.parallel.map_shard import (
    make_sharded_map_knn, shard_map_points, per_device_map_bytes)
from alego_tpu.ops.knn import knn

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


@needs_8
def test_sharded_knn_matches_single_device():
    rng = np.random.default_rng(0)
    Q, N, k = 512, 4096, 5
    q = jnp.asarray(rng.uniform(-40, 40, (Q, 3)).astype(np.float32))
    qm = jnp.asarray(rng.random(Q) < 0.9)
    mp = jnp.asarray(rng.uniform(-40, 40, (N, 3)).astype(np.float32))
    mok = jnp.asarray(rng.random(N) < 0.8)

    mesh = make_mesh(8)
    f = make_sharded_map_knn(mesh, k)
    mp_s, mok_s = shard_map_points(mesh, mp, mok)
    d_s, i_s = f(q, qm, mp_s, mok_s)

    d_r, i_r = knn(q, qm, mp, mok, k, chunk=1024)

    qn = np.asarray(qm)
    np.testing.assert_allclose(np.asarray(d_s)[qn], np.asarray(d_r)[qn],
                               rtol=1e-4, atol=1e-2)
    assert (np.asarray(i_s)[qn] == np.asarray(i_r)[qn]).mean() > 0.999


@needs_8
def test_sharded_knn_padding_and_memory():
    """N not divisible by D: pad rows are invalid and never win; per-device
    bytes are N/D-scaled."""
    rng = np.random.default_rng(1)
    Q, N, k = 256, 4000, 5           # 4000 % 8 = 0 -> use 3997 to force pad
    N = 3997
    q = jnp.asarray(rng.uniform(-10, 10, (Q, 3)).astype(np.float32))
    qm = jnp.ones(Q, bool)
    mp = jnp.asarray(rng.uniform(-10, 10, (N, 3)).astype(np.float32))
    mok = jnp.ones(N, bool)

    mesh = make_mesh(8)
    mp_s, mok_s = shard_map_points(mesh, mp, mok)
    assert mp_s.shape[0] % 8 == 0
    f = make_sharded_map_knn(mesh, k)
    d_s, i_s = f(q, qm, mp_s, mok_s)
    assert np.asarray(i_s).max() < N          # pad rows never selected
    assert np.isfinite(np.asarray(d_s)).all()

    assert per_device_map_bytes(2 ** 20, 8) == (2 ** 17) * 13
