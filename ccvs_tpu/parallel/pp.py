"""Pipeline-parallel execution of the GPT block stack (scaling headroom).

The reference is DP-only (SURVEY.md section 2.7) and its GPT (~300M params)
fits one chip, so pipeline parallelism is not required for parity. Like
``parallel/tp.py`` / ``parallel/sp.py`` this exists as TPU-native headroom:
a GPipe schedule expressed with `shard_map` + `lax.ppermute` over the mesh's
``model`` axis — each stage holds ``n_layer / n_stages`` of the layer-stacked
block params (shard the stacked leading axis), microbatch activations flow
stage-to-stage over ICI, and the whole schedule is one `lax.scan`, so it
jits into a single XLA program and differentiates (the transpose of
`ppermute` is the reverse permute, giving the backward pipeline for free).

Layout:
  - block params: leading (n_layer) axis sharded over 'model'
    (`stage_block_specs`), i.e. stage s holds layers [s*L/S, (s+1)*L/S).
  - activations: microbatch axis replicated, batch dim sharded over 'data'
    (pp composes with DP exactly like the TP rules do).

This is the classic scan-over-pipeline-ticks formulation: at tick t, stage 0
injects microbatch t, every stage applies its layers, and `ppermute` shifts
activations one stage forward; after ``n_micro + S - 1`` ticks the last
stage has produced every microbatch's output (earlier/later ticks compute
masked-out garbage — the GPipe bubble).
"""

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ccvs_tpu.config import TransformerConfig


def stage_block_specs(block_stack: Any, model_axis: str = "model"):
    """PartitionSpec tree sharding the stacked (n_layer, ...) leading axis."""
    return jax.tree_util.tree_map(
        lambda leaf: P(model_axis, *([None] * (leaf.ndim - 1))), block_stack
    )


def shard_stage_params(mesh, block_stack, model_axis: str = "model"):
    """Place the layer-stacked block params with layers split across stages."""
    specs = stage_block_specs(block_stack, model_axis)
    return jax.device_put(
        block_stack,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs),
    )


def pipeline_blocks(cfg: TransformerConfig, block_stack, emb, mesh, n_micro: int,
                    dtype=jnp.float32):
    """GPipe forward of the block stack: ``emb`` (B, T, D) -> (B, T, D).

    ``block_stack`` is the layer-stacked params under
    ``params["core"]["blocks"]["block"]`` (leading axis n_layer, shardable
    with :func:`shard_stage_params`). Differentiable; training microbatch
    forwards are deterministic (no dropout) on this path.
    """
    from jax.experimental.shard_map import shard_map

    from ccvs_tpu.nn.gpt import Block

    S = mesh.shape["model"]
    assert cfg.n_layer % S == 0, (cfg.n_layer, S)
    b, t, d = emb.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    block_mod = Block(cfg, dtype=dtype)
    n_ticks = n_micro + S - 1

    def stage_fn(local_stack, act):
        # local_stack: (n_layer/S, ...) pytree; apply this stage's layers
        def body(a, layer_params):
            a, _ = block_mod.apply({"params": layer_params}, a, deterministic=True)
            return a, None

        act, _ = jax.lax.scan(body, act, local_stack)
        return act

    def pp_fn(local_stack, xs):
        # xs: (n_micro, mb_local, T, D); runs per (data, model) device
        s = jax.lax.axis_index("model")

        def tick(carry, ti):
            inj = xs[jnp.clip(ti, 0, n_micro - 1)]
            a_in = jnp.where(s == 0, inj, carry)
            out = stage_fn(local_stack, a_in)
            nxt = jax.lax.ppermute(
                out, "model", [(i, (i + 1) % S) for i in range(S)]
            )
            return nxt, out

        zero = jnp.zeros(xs.shape[1:], xs.dtype)
        _, outs = jax.lax.scan(tick, zero, jnp.arange(n_ticks))
        # stage S-1 emits microbatch m at tick m + S - 1; everything else is
        # bubble garbage -> mask and broadcast the real outputs to all stages
        last = outs[S - 1:]
        mask = (s == S - 1).astype(last.dtype)
        return jax.lax.psum(last * mask, "model")

    fn = shard_map(
        pp_fn,
        mesh=mesh,
        in_specs=(P("model"), P(None, "data")),
        out_specs=P(None, "data"),
        check_rep=False,
    )
    out = fn(block_stack, emb.reshape(n_micro, mb, t, d))
    return out.reshape(b, t, d)


def pipeline_core(cfg: TransformerConfig, core_params, emb, mesh, n_micro: int,
                  dtype=jnp.float32):
    """Blocks pipeline + the final LayerNorm: drop-in for `GPTCore.apply` on
    the training forward (cache-free). ``core_params`` = ``params["core"]``."""
    import flax.linen as nn

    x = pipeline_blocks(cfg, core_params["blocks"]["block"], emb, mesh, n_micro,
                        dtype=dtype)
    # the same flax LayerNorm as GPTCore's ln_f (identical numerics)
    ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    return ln.apply({"params": core_params["ln_f"]}, x)
