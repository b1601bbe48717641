"""Fused bias-free MLP as a Pallas TPU kernel (the FullyFusedMLP equivalent).

TPU-native re-implementation of jnerf-myc's tiny-cuda-nn-style fused MLP
(ops/code_ops/fully_fused_mlp.py + fully_fused_mlp_function.o, SURVEY.md J11):

- forward: the whole layer chain runs per input tile with weights and
  activations resident in VMEM, MXU matmuls in bf16 with f32 accumulation —
  the XLA-dots version round-trips activations through HBM between layers,
  which measures as a fixed ~30 ms floor per 512k samples on v5e; this
  kernel removes that.
- backward: a second Pallas kernel recomputes the forward per tile (cheap,
  stays in VMEM), runs the backward chain for dx, and accumulates per-layer
  weight grads into revisited f32 output blocks across the sequential TPU
  grid — mirroring the reference's split of fused dgrad + per-layer
  accumulated weight-grad matmuls (fully_fused_mlp.py:88-145).

Constraints: all dims should be multiples of 8 (ideally 128 for MXU
efficiency); inputs are zero-padded by the wrapper like the reference pads
batches to 128 multiples (fully_fused_mlp.py:78-82).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024


def _fwd_kernel(x_ref, *refs):
    w_refs = refs[:-1]
    out_ref = refs[-1]
    h = x_ref[:]
    n = len(w_refs)
    for i, w in enumerate(w_refs):
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(x_ref.dtype)
    out_ref[:] = h


def _bwd_kernel(x_ref, g_ref, *refs):
    """Backward: recompute + chain. See _bwd_kernel docstring."""
    n_layers = (len(refs) - 1) // 2
    w_refs = refs[:n_layers]
    dx_ref = refs[n_layers]
    dw_refs = refs[n_layers + 1:]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for dw in dw_refs:
            dw[:] = jnp.zeros_like(dw)

    x = x_ref[:]
    post = [x]          # post-activation inputs to each layer
    for i, w in enumerate(w_refs):
        h = jnp.dot(post[-1], w[:], preferred_element_type=jnp.float32)
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
        post.append(h.astype(x.dtype))

    g = g_ref[:].astype(jnp.float32)  # d(out) == d(pre_last)
    for i in range(n_layers - 1, -1, -1):
        h_in = post[i]
        dw_refs[i][:] += jax.lax.dot_general(
            h_in.astype(jnp.float32), g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = jnp.dot(g.astype(x.dtype), w_refs[i][:].T,
                    preferred_element_type=jnp.float32)
        if i > 0:
            # relu mask of layer i-1's output; compare in f32 (bf16 compares
            # are unsupported on some TPU targets)
            g = g * (post[i].astype(jnp.float32) > 0.0)
    dx_ref[:] = g.astype(x.dtype)


def _pad_rows(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mlp(x: jnp.ndarray, weights: Tuple[jnp.ndarray, ...],
              tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """y = Wn(...relu(W1(relu(W0 x)))...) with everything fused per tile.

    x [M, D_in]; weights[i] [D_i, D_{i+1}] (bias-free, relu between layers,
    none at the end). Returns [M, D_out].
    """
    return _fused_mlp_fwd_impl(x, weights, tile)


def _fused_mlp_fwd_impl(x, weights, tile):
    M, d_in = x.shape
    d_out = weights[-1].shape[1]
    xp = _pad_rows(x, tile)
    n_tiles = xp.shape[0] // tile
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(w.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for w in weights],
        out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d_out), x.dtype),
    )(xp, *weights)
    return out[:M]


def _fused_mlp_fwd(x, weights, tile):
    return _fused_mlp_fwd_impl(x, weights, tile), (x, weights)


def _fused_mlp_bwd(tile, res, g):
    x, weights = res
    M, d_in = x.shape
    d_out = weights[-1].shape[1]
    xp = _pad_rows(x, tile)
    gp = _pad_rows(g.astype(x.dtype), tile)
    n_tiles = xp.shape[0] // tile
    n_layers = len(weights)
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(w.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for w in weights],
        out_specs=[pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] +
                  [pl.BlockSpec(w.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for w in weights],
        out_shape=[jax.ShapeDtypeStruct((xp.shape[0], d_in), x.dtype)] + dw_shapes,
    )(xp, gp, *weights)
    dx = outs[0][:M]
    dws = tuple(dw.astype(w.dtype) for dw, w in zip(outs[1:], weights))
    return dx, dws


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_reference(x: jnp.ndarray, weights: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pure-XLA reference implementation (for tests and non-TPU fallback)."""
    h = x
    n = len(weights)
    for i, w in enumerate(weights):
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(x.dtype)
    return h
