"""Minimal repro (VERDICT r3 #8): windowed-gather transpose under lax.scan
crashes the TPU runtime worker.

A ``lax.gather`` with slice_sizes=(2, 2, C) — the natural spelling of a
bilinear corner fetch (ops/grid_sample.py) — compiles and runs standalone,
and its scatter transpose (the autodiff backward) also runs standalone.
But the SAME grad program wrapped in a ``lax.scan`` body kills the TPU
worker (connection drops / process aborts) on this platform (jax 0.9.0,
v5e via the axon tunnel). The shipped grid_sample packs corners with plain
shifted copies instead, precisely to avoid this (PERF_NOTES §5d caveat).

Run: python scripts/repro_crash_windowed_gather_scan.py [--scan]
Without --scan it runs the standalone grad (expected: OK, prints a value).
With --scan it runs the identical grad inside a 4-step scan (on the
round-3 toolchain: worker crash before the final print).

STATUS round 4 (2026-08-18, jax 0.9.0): NO LONGER REPRODUCES at either the
minimal (G=64, C=16, N=4096) or the TensoRF-real (G=300, C=48, N=393216,
16-step scan) shapes. The shipped grid_sample keeps the shifted-copy
packing regardless — it is the faster access pattern (PERF_NOTES §5d).
Kept as a regression probe for toolchain moves.
"""
import sys

import jax
import jax.numpy as jnp
from jax import lax

G, C, N = 64, 16, 4096


def windowed_sample(grid, idx):
    """grid [G, G, C], idx [N, 2] int32 -> [N, 2, 2, C] corner windows."""
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return lax.gather(grid, idx, dnums, slice_sizes=(2, 2, C))


def loss(grid, idx):
    win = windowed_sample(grid, idx)          # [N, 2, 2, C]
    return (win.sum(axis=(1, 2)) ** 2).mean()


def main():
    scan = "--scan" in sys.argv
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (G, G, C))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N, 2), 0, G - 2)

    if not scan:
        g = jax.jit(jax.grad(loss))(grid, idx)
        print("standalone grad OK:", float(g.sum()))
        return

    @jax.jit
    def scanned(grid, idx):
        def body(g, _):
            return g - 1e-3 * jax.grad(loss)(g, idx), None

        out, _ = lax.scan(body, grid, None, length=4)
        return out

    out = scanned(grid, idx)
    print("scanned grad OK:", float(out.sum()))  # not reached when affected


if __name__ == "__main__":
    main()
