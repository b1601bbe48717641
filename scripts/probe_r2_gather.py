"""Round-2 TPU probes: gather/scatter/sort rooflines that decide the kernel design.

Each probe prints one JSON line. Timing uses a host read (float(out.sum()))
because jax.block_until_ready does not reliably block on the axon platform.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


key = jax.random.PRNGKey(0)

# ---------------------------------------------------------------- P2: gather rows/s vs width
N = 1 << 21  # 2M rows gathered
T = 1 << 19
idx = jax.random.randint(key, (N,), 0, T)
for width in [2, 8, 32, 128, 256, 512, 1024, 1536]:
    try:
        tab = jnp.ones((T, width), jnp.float32)
        f = jax.jit(lambda t, i: t[i].sum(axis=-1))
        dt, _ = bench(f, tab, idx, iters=3, warmup=1)
        emit("gather_width", width_f32=width, mrows_s=round(N / dt / 1e6, 1), ms=round(dt * 1e3, 1))
    except Exception as e:  # noqa
        emit("gather_width", width_f32=width, error=str(e)[:200])

# bf16 wide rows
for width in [256, 512]:
    try:
        tab = jnp.ones((T, width), jnp.bfloat16)
        f = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum(axis=-1))
        dt, _ = bench(f, tab, idx, iters=3, warmup=1)
        emit("gather_width_bf16", width=width, mrows_s=round(N / dt / 1e6, 1))
    except Exception as e:
        emit("gather_width_bf16", width=width, error=str(e)[:200])

# ---------------------------------------------------------------- P9: do independent gathers overlap?
tabA = jnp.ones((T, 8), jnp.float32)
tabB = jnp.ones((T, 8), jnp.float32)
idxB = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T)
fA = jax.jit(lambda t, i: t[i].sum())
fAB = jax.jit(lambda ta, tb, ia, ib: ta[ia].sum() + tb[ib].sum())
dtA, _ = bench(fA, tabA, idx, iters=3, warmup=1)
dtAB, _ = bench(fAB, tabA, tabB, idx, idxB, iters=3, warmup=1)
emit("gather_overlap", one_ms=round(dtA * 1e3, 1), two_ms=round(dtAB * 1e3, 1),
     ratio=round(dtAB / dtA, 2))

# ---------------------------------------------------------------- P6: 2-row slice gather
try:
    tab = jnp.ones((T, 8), jnp.float32)
    def slice2(t, i):
        # gather slices of 2 consecutive rows per index
        return jax.vmap(lambda j: jax.lax.dynamic_slice(t, (j, 0), (2, 8)))(i).sum(axis=(-1, -2))
    f = jax.jit(slice2)
    i2 = jnp.clip(idx[: N // 2], 0, T - 2)
    dt, _ = bench(f, tab, i2, iters=3, warmup=1)
    emit("gather_slice2", midx_s=round((N // 2) / dt / 1e6, 1), eff_mrows_s=round(N / dt / 1e6, 1))
except Exception as e:
    emit("gather_slice2", error=str(e)[:200])

# ---------------------------------------------------------------- P1: sort throughput
for n in [1 << 20, 1 << 22, 1 << 25]:
    k = jax.random.randint(key, (n,), 0, 1 << 19)
    v = jax.random.normal(key, (n,))
    f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v)[1])
    try:
        dt, _ = bench(f, k, v, iters=3, warmup=1)
        emit("sort_key_val", n=n, melem_s=round(n / dt / 1e6, 1), ms=round(dt * 1e3, 1))
    except Exception as e:
        emit("sort_key_val", n=n, error=str(e)[:200])

# ---------------------------------------------------------------- P3: scatter-add rows/s
Nsc = 1 << 21
for width, mode in [(2, "rand"), (16, "rand"), (128, "rand"), (256, "rand"),
                    (2, "sorted"), (128, "sorted"), (2, "seg"), (128, "seg")]:
    try:
        upd = jnp.ones((Nsc, width), jnp.float32)
        i = jax.random.randint(key, (Nsc,), 0, T)
        if mode in ("sorted", "seg"):
            i = jnp.sort(i)
        if mode == "seg":
            f = jax.jit(lambda u, i: jax.ops.segment_sum(u, i, num_segments=T,
                                                         indices_are_sorted=True))
        else:
            srt = mode == "sorted"
            f = jax.jit(lambda u, i, s=srt: jnp.zeros((T, u.shape[1]), u.dtype)
                        .at[i].add(u, indices_are_sorted=s))
        dt, _ = bench(f, upd, i, iters=3, warmup=1)
        emit("scatter_add", width=width, mode=mode, mrows_s=round(Nsc / dt / 1e6, 1),
             ms=round(dt * 1e3, 1))
    except Exception as e:
        emit("scatter_add", width=width, mode=mode, error=str(e)[:200])

# ------------------------------------------------- P8: weighted lane-reduction einsum nv,nvf->nf
Ns = 1 << 18
V, F = 128, 2
w = jax.random.normal(key, (Ns, V))
rows = jax.random.normal(key, (Ns, V * F))
def interp(w, rows):
    r = rows.reshape(Ns, V, F)
    return jnp.einsum("nv,nvf->nf", w, r)
f = jax.jit(interp)
dt, _ = bench(f, w, rows, iters=3, warmup=1)
emit("brick_interp_einsum", n=Ns, ms=round(dt * 1e3, 2), msamples_s=round(Ns / dt / 1e6, 1))

# ------------------------------------------------- P7: dense-level factored contraction
# out[n,f] = sum_xyz wx[n,x] wy[n,y] wz[n,z] grid[x,y,z,f], R=32
R, F = 32, 2
wx = jax.random.normal(key, (Ns, R))
wy = jax.random.normal(key, (Ns, R))
wz = jax.random.normal(key, (Ns, R))
grid = jax.random.normal(key, (R, R, R, F), jnp.bfloat16)
def dense_contract(wx, wy, wz, grid):
    g = grid.reshape(R, R * R * F).astype(jnp.bfloat16)
    t1 = jnp.dot(wx.astype(jnp.bfloat16), g, preferred_element_type=jnp.float32)  # n, R*R*F
    t1 = t1.reshape(Ns, R, R * F)
    t2 = jnp.einsum("ny,nyk->nk", wy.astype(jnp.bfloat16), t1.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).reshape(Ns, R, F)
    return jnp.einsum("nz,nzf->nf", wz.astype(jnp.bfloat16), t2.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
f = jax.jit(dense_contract)
try:
    dt, _ = bench(f, wx, wy, wz, grid, iters=3, warmup=1)
    emit("dense_contract_R32", n=Ns, ms=round(dt * 1e3, 2), msamples_s=round(Ns / dt / 1e6, 1))
except Exception as e:
    emit("dense_contract_R32", error=str(e)[:300])

# ------------------------------------------------- one-hot matmul occupancy probe (pure XLA)
# probe occupancy grid 32^3 via two-stage one-hot: row select then lane select
Np = 1 << 21
occ = (jax.random.uniform(key, (256, 128)) > 0.9).astype(jnp.bfloat16)
pid = jax.random.randint(key, (Np,), 0, 256 * 128)
def onehot_probe(occ, pid):
    a = pid // 128
    b = pid % 128
    oh_a = (a[:, None] == jnp.arange(256)[None, :]).astype(jnp.bfloat16)  # N x 256
    rows = jnp.dot(oh_a, occ, preferred_element_type=jnp.float32)  # N x 128
    oh_b = (b[:, None] == jnp.arange(128)[None, :])
    return jnp.sum(jnp.where(oh_b, rows, 0.0), axis=-1)
f = jax.jit(onehot_probe)
try:
    dt, _ = bench(f, occ, pid, iters=3, warmup=1)
    emit("onehot_occ_probe", n=Np, ms=round(dt * 1e3, 2), mprobes_s=round(Np / dt / 1e6, 1))
except Exception as e:
    emit("onehot_occ_probe", error=str(e)[:300])

emit("done_xla_probes")
