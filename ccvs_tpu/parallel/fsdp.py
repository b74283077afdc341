"""FSDP / ZeRO-style parameter + optimizer sharding over the 'data' axis.

The reference is DP-only (apex DDP, `tools/engine.py:71-74`): every GPU
holds full params, grads, and Adam moments. At the full-length BAIR GPT
config (B=4, L=1023) the fwd/bwd already needs ~18 GB (PERF_NOTES.md), and
params + two Adam moments triple the static footprint. The TPU-native fix
is not a wrapper class but sharding annotations: place each large leaf of
the param/opt pytree split along the ``data`` mesh axis and let GSPMD
insert the all-gather (params, fwd/bwd) and reduce-scatter (grads) —
exactly ZeRO-3 semantics, compiled into the step program and overlapped
with compute by XLA's scheduler (scaling-book FSDP recipe).

Composes with tensor parallelism: leaves already split on the ``model``
axis (``parallel.tp``) get their data-axis split on the largest remaining
free dimension.

Usage::

    state = state.replace(params=shard_fsdp(mesh, params),
                          opt=shard_fsdp(mesh, opt_state))
    # jit as usual; outputs inherit the shardings

Elementwise optimizer updates preserve the layout, so the train state
stays sharded across steps with zero resharding traffic.
"""

from typing import Any, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, n_shards: int, axis: str, base: Optional[P], min_size: int):
    """Split ``leaf`` on its largest dimension divisible by ``n_shards``
    that isn't already taken by ``base`` (e.g. a tensor-parallel split)."""
    if leaf.size < min_size:
        return base if base is not None else P()
    taken = list(base) if base is not None else []
    taken += [None] * (leaf.ndim - len(taken))
    # largest free divisible dim; ties -> later dim (channel-last layouts
    # keep the leading layer-stack dim replicated for cheap scan slicing)
    cand = [d for d in range(leaf.ndim)
            if taken[d] is None and leaf.shape[d] % n_shards == 0]
    if not cand:
        return base if base is not None else P()
    d = max(cand, key=lambda i: (leaf.shape[i], i))
    taken[d] = axis
    return P(*taken)


def fsdp_param_specs(params: Any, mesh, axis: str = "data",
                     base_specs: Optional[Any] = None, min_size: int = 2 ** 12):
    """PartitionSpec tree: every leaf with >= ``min_size`` elements is split
    along ``axis`` on its largest free divisible dim; small leaves (biases,
    norm scales) stay replicated — gathering them costs more than storing.

    ``base_specs``: optional existing spec tree (``tp.gpt_param_specs``) to
    compose with; its axis assignments are preserved.
    """
    n = mesh.shape[axis]
    if base_specs is None:
        return jax.tree_util.tree_map(
            lambda x: _leaf_spec(x, n, axis, None, min_size), params)
    return jax.tree_util.tree_map(
        lambda x, b: _leaf_spec(x, n, axis, b, min_size), params, base_specs)


def shard_fsdp(mesh, tree: Any, axis: str = "data",
               base_specs: Optional[Any] = None, min_size: int = 2 ** 12):
    """Place ``tree`` with FSDP specs. Works on the param tree AND on optax
    opt-state nests unchanged: specs are a pure function of leaf shape, so
    adam's mu/nu (same shapes as params) land on identical shards and the
    scalar count stays replicated."""
    specs = fsdp_param_specs(tree, mesh, axis, base_specs, min_size)
    return jax.device_put(
        tree, jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs))
