"""1-NN micro-shootout: XLA chunked matmul vs fused Pallas kernel.

Round 1 measured the Pallas kernel slower inside the ICP while_loop and
shelved it.  The package now forces f32-HIGHEST matmuls (6 MXU passes) for
accuracy, which taxes the XLA distance-matrix path but not the Pallas
kernel (VPU diff-squares, exact f32 by construction) — so re-measure and
set the dispatcher accordingly (VERDICT weak #8: productionize or delete).

Shapes: the loop-ICP correspondence search (4096 x 32768) and the
scan-to-map 1-NN (10240 x 24576).
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from alego_tpu.ops.knn import nn1 as nn1_xla, knn as knn_xla
from alego_tpu.ops.pallas_nn import nn1_pallas, knn_pallas


def bench(fn, args, reps=20):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    rng = np.random.default_rng(0)
    for name, Q, N in (("loop-ICP", 4096, 32768),
                       ("scan-to-map", 10240, 24576)):
        q = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))
        qm = jnp.asarray(rng.random(Q) < 0.9)
        r = jnp.asarray(rng.uniform(-50, 50, (N, 3)).astype(np.float32))
        rm = jnp.asarray(rng.random(N) < 0.9)

        f_x = jax.jit(lambda a, b, c, d: nn1_xla(a, b, c, d, chunk=4096))
        f_p = jax.jit(lambda a, b, c, d: nn1_pallas(a, b, c, d))

        tx = bench(f_x, (q, qm, r, rm))
        tp = bench(f_p, (q, qm, r, rm))

        dx, ix = f_x(q, qm, r, rm)
        dp, ip = f_p(q, qm, r, rm)
        agree = float(np.mean(np.asarray(ix) == np.asarray(ip)))
        derr = float(np.max(np.abs(np.asarray(dx) - np.asarray(dp))
                            [np.asarray(qm)]))
        print(f"{name:12s} Q={Q} N={N}: xla {tx*1e3:.2f} ms, "
              f"pallas {tp*1e3:.2f} ms ({tx/tp:.2f}x), "
              f"idx agree {agree:.4f}, |d2 err| {derr:.2e}", flush=True)

    # the scan-to-map 5-NN (the mapping hot spot: 2x20 GN iterations each
    # doing corner+surf 5-NN against the local map)
    for name, Q, N in (("map 5NN corner", 2048, 8192),
                       ("map 5NN surf", 8192, 16384)):
        q = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))
        qm = jnp.asarray(rng.random(Q) < 0.9)
        r = jnp.asarray(rng.uniform(-50, 50, (N, 3)).astype(np.float32))
        rm = jnp.asarray(rng.random(N) < 0.9)
        f_x = jax.jit(lambda a, b, c, d: knn_xla(a, b, c, d, 5, chunk=4096))
        f_p = jax.jit(lambda a, b, c, d: knn_pallas(a, b, c, d, k=5))
        tx = bench(f_x, (q, qm, r, rm))
        tp = bench(f_p, (q, qm, r, rm))
        dx, ix = f_x(q, qm, r, rm)
        dp, ip = f_p(q, qm, r, rm)
        qn = np.asarray(qm)
        agree = float(np.mean(np.asarray(ix)[qn] == np.asarray(ip)[qn]))
        derr = float(np.max(np.abs(np.asarray(dx)[qn] - np.asarray(dp)[qn])))
        print(f"{name:14s} Q={Q} N={N}: xla {tx*1e3:.2f} ms, "
              f"pallas {tp*1e3:.2f} ms ({tx/tp:.2f}x), "
              f"idx agree {agree:.4f}, |d2 err| {derr:.2e}", flush=True)


if __name__ == "__main__":
    main()
