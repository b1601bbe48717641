"""Minimal repro (VERDICT r3 #8): the vertex-hash encode's gradient under a
multi-step lax.scan crashes the TPU worker.

The reference-shaped hash-grid encode (models/ngp.hash_encode: 8 modulo-
hashed corner gathers per level into one flat [n_params, F] table) trains
fine as single-step dispatches, but wrapping the SAME train step in a
16-step ``lax.scan`` block kills the TPU worker on this platform
(jax 0.9.0, v5e via the axon tunnel) — the round-3 quality anchor had to
run ``--no_scan`` because of this (PERF_NOTES §8). The shipped brick
layouts do not trigger it.

Run: python scripts/repro_crash_vertexhash_scan.py [--scan] [--levels L]
Without --scan: 4 single dispatches of the grad step (expected: OK).
With --scan: one 4-step scan of the identical step (on the round-3
toolchain: worker crash / dropped connection before the print).

STATUS round 4 (2026-08-18, jax 0.9.0): NO LONGER REPRODUCES — both this
minimal form and the full vertex-hash 16-step train block (march + MLPs +
Adam + EMA at the bench shape) now run under scan on the tunnel
(5.2 krays/s steady). Kept as a regression probe for toolchain moves.
"""
import sys

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from myc_nerfs_tpu.models.ngp import (HashGridConfig, compute_levels,
                                      hash_encode, init_hash_table)

N_SAMPLES = 262144


def main():
    scan = "--scan" in sys.argv
    n_levels = 16
    if "--levels" in sys.argv:
        n_levels = int(sys.argv[sys.argv.index("--levels") + 1])
    cfg = HashGridConfig(n_levels=n_levels)
    levels = compute_levels(cfg)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, cfg, levels)
    pos = jax.random.uniform(jax.random.fold_in(key, 1), (N_SAMPLES, 3))

    def loss(table, pos):
        return (hash_encode(table, pos, cfg, levels) ** 2).mean()

    step = jax.grad(loss)

    if not scan:
        t = table
        for i in range(4):
            t = t - 1e-2 * jax.jit(step)(t, pos)
        print("single dispatches OK:", float(t.sum()))
        return

    @jax.jit
    def scanned(table, pos):
        def body(t, _):
            return t - 1e-2 * step(t, pos), None

        out, _ = lax.scan(body, table, None, length=4)
        return out

    out = scanned(table, pos)
    print("scanned OK:", float(out.sum()))  # not reached when affected


if __name__ == "__main__":
    main()
