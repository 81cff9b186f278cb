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
