import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alego_tpu.ops.pallas_nn import nn1_pallas
from alego_tpu.ops.knn import nn1

INTERPRET = jax.default_backend() != "tpu"


def test_nn1_pallas_matches_xla():
    rng = np.random.default_rng(0)
    Q, N = 300, 3000
    q = rng.uniform(-20, 20, (Q, 3)).astype(np.float32)
    r = rng.uniform(-20, 20, (N, 3)).astype(np.float32)
    qm = np.ones(Q, bool)
    rm = rng.random(N) < 0.8

    d_p, i_p = nn1_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                          jnp.asarray(rm), interpret=INTERPRET)
    d_x, i_x = nn1(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                   jnp.asarray(rm), chunk=1024)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-4, atol=1e-4)
    # indices may differ only on exact distance ties
    dd = ((q[:, None] - r[None]) ** 2).sum(-1)
    dd[:, ~rm] = np.inf
    got = np.take_along_axis(dd, np.asarray(i_p)[:, None], 1)[:, 0]
    np.testing.assert_allclose(got, np.asarray(d_x), rtol=1e-4, atol=1e-4)


def test_nn1_pallas_all_invalid_refs():
    q = jnp.zeros((8, 3), jnp.float32)
    r = jnp.ones((16, 3), jnp.float32)
    d, i = nn1_pallas(q, jnp.ones(8, bool), r, jnp.zeros(16, bool),
                      interpret=INTERPRET)
    assert float(jnp.min(d)) > 1e29


def test_knn_pallas_matches_xla():
    """The production scan-to-map 5-NN path (knn_best dispatches here on
    TPU): exact agreement with the chunk-streamed XLA top-k."""
    from alego_tpu.ops.pallas_nn import knn_pallas
    from alego_tpu.ops.knn import knn

    rng = np.random.default_rng(3)
    Q, N, k = 300, 1500, 5
    q = rng.uniform(-50, 50, (Q, 3)).astype(np.float32)
    r = rng.uniform(-50, 50, (N, 3)).astype(np.float32)
    qm = rng.random(Q) < 0.9
    rm = rng.random(N) < 0.8

    d_p, i_p = knn_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                          jnp.asarray(rm), k=k, tq=128, tr=512,
                          interpret=INTERPRET)
    d_x, i_x = knn(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                   jnp.asarray(rm), k, chunk=512)
    np.testing.assert_allclose(np.asarray(d_p)[qm], np.asarray(d_x)[qm],
                               rtol=1e-4, atol=1e-2)
    # ascending order
    dp = np.asarray(d_p)[qm]
    assert (np.diff(dp, axis=1) >= -1e-5).all()
    # index agreement modulo exact ties
    assert (np.asarray(i_p)[qm] == np.asarray(i_x)[qm]).mean() > 0.999


@pytest.mark.parametrize("kernel", ["nn1", "knn"])
def test_pallas_occupancy_skipping_exact(kernel):
    """Tile skipping past the last valid query/reference (the scalar-prefetch
    occupancy optimisation) must not change results: front-compacted masks at
    ~15% occupancy, PLUS mid-array mask holes (which skipping must never
    remove — only the BIG penalty handles those), against the XLA oracle."""
    from alego_tpu.ops.pallas_nn import knn_pallas
    from alego_tpu.ops.knn import knn

    rng = np.random.default_rng(7)
    Q, N = 512, 2048
    q = rng.uniform(-100, 100, (Q, 3)).astype(np.float32)
    r = rng.uniform(-100, 100, (N, 3)).astype(np.float32)
    # front-compacted validity with interior holes; many dead tail tiles
    qm = np.zeros(Q, bool)
    qm[:80] = True
    qm[17] = qm[63] = False
    rm = np.zeros(N, bool)
    rm[:300] = True
    rm[50:60] = False
    args = (jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r), jnp.asarray(rm))

    if kernel == "nn1":
        d_p, i_p = nn1_pallas(*args, tq=128, tr=512, interpret=INTERPRET)
        d_x, i_x = knn(*args, 1, chunk=512)
        d_x, i_x = d_x[:, 0], i_x[:, 0]
    else:
        d_p, i_p = knn_pallas(*args, k=5, tq=128, tr=512, interpret=INTERPRET)
        d_x, i_x = knn(*args, 5, chunk=512)
    np.testing.assert_allclose(np.asarray(d_p)[qm], np.asarray(d_x)[qm],
                               rtol=1e-4, atol=1e-3)
    assert (np.asarray(i_p)[qm] == np.asarray(i_x)[qm]).mean() > 0.999
    # invalid queries still report BIG
    assert float(np.min(np.asarray(d_p)[~qm])) > 1e29
