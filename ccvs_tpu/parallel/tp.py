"""Tensor-parallel sharding rules for the GPT.

The reference never shards parameters (DP-only, SURVEY.md section 2.7); at
~300M params one chip holds the model. These rules exist for scaling headroom:
Megatron-style head/MLP partitioning over the mesh's ``model`` axis —
qkv projections split on the output (head) dimension, the attention output
projection and the MLP down-projection split on the input dimension, so XLA
GSPMD inserts exactly one all-reduce per attention block and one per MLP.

Usage:
    specs = gpt_param_specs(params)                  # pytree of PartitionSpec
    params = jax.device_put(params, jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs))
    # jit as usual; GSPMD propagates the shardings
"""

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def gpt_param_specs(params: Any, model_axis: str = "model"):
    """PartitionSpec tree for GPT params (layer-stacked blocks)."""

    def spec(path, leaf):
        keys = [getattr(k, "key", None) for k in path]
        nd = leaf.ndim
        if "attn" in keys:
            if any(k in keys for k in ("query", "key", "value")):
                # kernel (L, D, D) split on heads (output); bias (L, D)
                return P(None, None, model_axis) if nd == 3 else P(None, model_axis)
            if "proj" in keys:
                # row-parallel: split on input dim; bias replicated
                return P(None, model_axis, None) if nd == 3 else P()
        if "fc1" in keys:
            return P(None, None, model_axis) if nd == 3 else P(None, model_axis)
        if "fc2" in keys:
            return P(None, model_axis, None) if nd == 3 else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_gpt_params(mesh, params, model_axis: str = "model"):
    specs = gpt_param_specs(params, model_axis)
    return jax.device_put(
        params,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs),
    )
