"""Round-3 probe B: paired-level brick rows — does per-row cost stay flat?

probe_r3a showed scatter/gather cost is per ISSUED row (~76-79 Mrows/s in a
14-op program) regardless of duplication, and sort-based dedup can't beat it
because permuting payload costs per-row too. The remaining lever: fewer,
fatter rows. Pairing adjacent hashed levels into one row (finer level's 4^3
brick + coarser level's covering verts = 512 floats = 1 KB bf16) halves the
issued rows IF the per-row cost stays flat at 1-2 KB.

  B1  scatter-add 262k bf16 rows, width {256, 512, 768, 1024} x L ops
  B2  gather, same widths
  B3  end-to-end paired-encode emulation: fwd and fwd+bwd, 6 paired tables
      [4096, 512] vs 12 single tables [4096, 256]
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def timed(fn, *args, reps=3):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


key = jax.random.PRNGKey(0)
N, T = 1 << 18, 4096

# --- B1/B2: width sweep at matched total ops (L=6 per program) --------------
for width in (256, 512, 768, 1024):
    L = 6
    rows = [jax.random.normal(jax.random.fold_in(key, 10 + l), (N, width),
                              jnp.float32).astype(jnp.bfloat16)
            for l in range(L)]
    idxs = [jax.random.randint(jax.random.fold_in(key, 50 + l), (N,), 0, T,
                               jnp.int32) for l in range(L)]

    def scat(rows_in, idx_in):
        return [jnp.zeros((T, width), jnp.bfloat16)
                .at[idx_in[l]].add(rows_in[l], mode="promise_in_bounds")
                for l in range(L)]

    dt = timed(jax.jit(scat), rows, idxs)
    emit(f"B1_scatter_w{width}", ms=round(dt * 1e3, 1),
         mrows_s=round(N * L / dt / 1e6, 1),
         gb_s=round(N * L * width * 2 / dt / 1e9, 1))

    tables = [jax.random.normal(jax.random.fold_in(key, 80 + l), (T, width),
                                jnp.float32).astype(jnp.bfloat16)
              for l in range(L)]

    def gath(tabs, idx_in):
        return [tabs[l][idx_in[l]] for l in range(L)]

    dt = timed(jax.jit(gath), tables, idxs)
    emit(f"B2_gather_w{width}", ms=round(dt * 1e3, 1),
         mrows_s=round(N * L / dt / 1e6, 1),
         gb_s=round(N * L * width * 2 / dt / 1e9, 1))


# --- B3: end-to-end encode emulation (fwd / fwd+bwd) ------------------------
def emulate(n_tables, width, label):
    """Gather + hat-weight reduce per table, like brick_encode's core."""
    tabs = [jax.random.normal(jax.random.fold_in(key, 200 + l), (T, width),
                              jnp.float32) for l in range(n_tables)]
    idxs = [jax.random.randint(jax.random.fold_in(key, 300 + l), (N,), 0, T,
                               jnp.int32) for l in range(n_tables)]
    n_vert_groups = width // 128  # feature x level slices per row
    wls = [jax.random.uniform(jax.random.fold_in(key, 400 + l),
                              (N, 128), jnp.float32).astype(jnp.bfloat16)
           for l in range(n_tables)]

    def encode(tabs_in):
        feats = []
        for l in range(n_tables):
            rows = tabs_in[l].astype(jnp.bfloat16)[idxs[l]]
            for v in range(n_vert_groups):
                feats.append((rows[:, v * 128:(v + 1) * 128]
                              * wls[l]).sum(-1))
        return jnp.stack(feats, -1)

    def loss(tabs_in):
        return encode(tabs_in).astype(jnp.float32).sum()

    dt = timed(jax.jit(encode), tabs)
    emit(f"B3_{label}_fwd", ms=round(dt * 1e3, 1))
    dt = timed(jax.jit(jax.grad(loss)), tabs)
    emit(f"B3_{label}_fwdbwd", ms=round(dt * 1e3, 1))


emulate(12, 256, "single12_w256")
emulate(6, 512, "paired6_w512")
emulate(4, 768, "triple4_w768")
