"""One-time parameter casting for generation.

Generation entry points cast fp32 params to bf16 once instead of per-step
in-graph (a per-token re-read of the fp32 tree is ~2x the HBM traffic of the
whole decode step). Leaves whose tree path contains a ``keep_fp32`` name are
left untouched — `nn.gpt.decode_step_fn` consumes the final LayerNorm's
scale/bias in deliberately-fp32 arithmetic, so those two vectors stay fp32.
"""

import jax
import jax.numpy as jnp


def cast_params_bf16(params, keep_fp32=("ln_f",)):
    keep = set(keep_fp32)

    def cast(path, p):
        if not hasattr(p, "dtype") or p.dtype != jnp.float32:
            return p
        if any(getattr(k, "key", None) in keep for k in path):
            return p
        return p.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)
