"""Pallas TPU kernel: single-token (flash-decode) attention.

XLA lowers the cached decode attention — 32 tiny per-(batch, head) matvecs
against a (L, head_dim) cache — at a few percent of HBM bandwidth (measured
~270us/layer for ~10MB of cache reads on v5e). This kernel fuses
scores -> masked softmax -> value reduction per (batch, head) grid cell, so
each cache tile is read exactly once at streaming bandwidth.

Numerics match the jnp path: fp32 scores/softmax, output cast to the query
dtype. Used by `ccvs_tpu.nn.gpt.CausalSelfAttention` when enabled (TPU only;
the einsum path remains the reference/CPU implementation).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    # blocks: q/o (1, nh, hd) (head row selected in-kernel); k/v (1, 1, L, hd)
    j = pl.program_id(1)
    pos = pos_ref[0]
    k = k_ref[0, 0]  # (L, hd)
    v = v_ref[0, 0]
    # select head row j via masked reduce (dynamic sublane slices must be
    # 8-aligned on TPU)
    q_all = q_ref[0]  # (nh, hd)
    head_ids = jax.lax.broadcasted_iota(jnp.int32, q_all.shape, 0)
    q = jnp.sum(jnp.where(head_ids == j, q_all, 0).astype(jnp.float32), axis=0,
                keepdims=True)  # (1, hd)

    # f32 operands: Mosaic rejects mixed bf16->f32 dot_general here
    scores = jax.lax.dot_general(
        k.astype(jnp.float32), q,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (L, 1)
    scores = scores * scale
    l = k.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    scores = jnp.where(ids <= pos, scores, -1e9)
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=0, keepdims=True)
    att = (e / denom)  # (L, 1) fp32
    out = jax.lax.dot_general(
        att, v.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, hd)

    # scatter into head row j: zero-init on the first head, then accumulate
    @pl.when(j == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_ref[0] = o_ref[0] + jnp.where(
        head_ids == j, out.astype(jnp.float32), 0.0
    ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(q, k_cache, v_cache, pos, interpret=False):
    """Single-token cached attention.

    Args:
      q: (B, nh, hd) query for the current position.
      k_cache / v_cache: (B, nh, L, hd).
      pos: scalar int32 — positions > pos are masked out.

    Returns:
      (B, nh, hd) attention output in q's dtype.
    """
    b, nh, hd = q.shape
    l = k_cache.shape[2]
    scale = 1.0 / (hd**0.5)
    pos_arr = jnp.full((1,), pos, jnp.int32)

    return pl.pallas_call(
        partial(_kernel, scale=scale),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nh, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, l, hd), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, l, hd), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nh, hd), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        interpret=interpret,
    )(pos_arr, q, k_cache, v_cache)
