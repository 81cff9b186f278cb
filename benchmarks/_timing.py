"""Shared TPU timing helper for the benchmark harnesses.

Under the tunneled axon backend every dispatch+fence costs ~30 ms of
host-side round trip, so a fori_loop of `reps` calls has a floor of
~30/reps ms per call that swamps sub-millisecond kernels.  `timed()`
measures that floor once with a trivial body and subtracts it.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

_FLOOR = {}


def _measure(loop, reps, rounds=3):
    o = loop()
    _ = np.asarray(jax.tree_util.tree_leaves(o)[0])   # warm the program
    best = np.inf
    for _ in range(rounds):
        t0 = time.time()
        o = loop()
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.time() - t0) / reps)
    return best


def dispatch_floor(reps: int) -> float:
    """Per-call seconds of a trivial fori_loop body at this rep count."""
    if reps not in _FLOOR:
        x = jnp.ones((8, 128))
        loop = jax.jit(
            lambda: jax.lax.fori_loop(0, reps, lambda _, c: c + 1.0, x))
        _FLOOR[reps] = _measure(loop, reps)
    return _FLOOR[reps]


def timed(fn, args, reps: int = 30) -> float:
    """Median per-call seconds of fn(*args), floor-subtracted.

    A repetition loop with loop-invariant args is NOT a valid timing loop:
    XLA's loop-invariant code motion hoists the whole body out and the
    "measurement" reads pure loop overhead (this is exactly what zeroed the
    loop-closure roofline row at 0.001 ms).  Every float input is therefore
    perturbed by ``0 * s`` with a carried scalar ``s`` — algebraically a
    no-op, but not provably so to the compiler (0 * s is NaN-propagating),
    which pins one real evaluation per iteration.  The adds fuse into their
    consumers.  A host transfer of the carried output fences the tunneled
    device.
    """
    f1 = jax.jit(fn)
    out = f1(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])

    leaves, treedef = jax.tree_util.tree_flatten(args)

    def perturbed(s):
        # pin EVERY array leaf, not just floats: a function whose inputs are
        # all bool/int (labels, connectivity masks) is otherwise
        # loop-invariant and XLA hoists it — the measurement reads 0.000
        z = s * 0          # not provably zero (NaN-propagating)
        new = []
        for l in leaves:
            if not hasattr(l, "dtype"):
                new.append(l)
            elif jnp.issubdtype(l.dtype, jnp.floating):
                new.append(l + z.astype(l.dtype))
            elif l.dtype == jnp.bool_:
                new.append(l ^ (z != 0))
            elif jnp.issubdtype(l.dtype, jnp.integer):
                new.append(l + z.astype(l.dtype))
            else:
                new.append(l)
        return jax.tree_util.tree_unflatten(treedef, new)

    def body(i, carry):
        s, _ = carry
        o = fn(*perturbed(s))
        return s + 1.0, o

    loop = jax.jit(lambda: jax.lax.fori_loop(
        0, reps, body, (jnp.float32(1.0), f1(*args))))
    raw = _measure(loop, reps)
    return max(raw - dispatch_floor(reps), 0.0)
