"""Sequence-parallel activation sharding for the GPT (scaling headroom).

The reference is DP-only (SURVEY.md section 2.7) and its attention is full
T x T over at most ~1.3k tokens (`mingpt.py:71-76`), so sequence parallelism
is not required for parity — this module exists for the same reason as
``parallel/tp.py``: headroom past one chip, the Megatron-SP analog expressed
the GSPMD way. Instead of hand-written ring collectives, the training
forward carries ``with_sharding_constraint`` annotations that shard the
token axis of every block activation over the mesh's ``model`` axis; XLA
inserts the all-gathers around attention (K/V need the full sequence) and
keeps every LayerNorm / MLP / residual computing on a 1/sp slice of the
tokens, which is where the activation memory lives.

Opt-in: set ``TransformerConfig.seq_parallel = True`` and trace the train
step inside a ``with mesh:`` context (bare ``PartitionSpec`` constraints
need the physical mesh; `TransformerTrainer` enters it automatically).
Outside a mesh context the constraint is a no-op, so the same config can
still run single-chip programs (e.g. cached decode, which is sequence-length
1 and never sharded this way).
"""

import jax
from jax.sharding import PartitionSpec as P


def seq_shard(x, batch_axis: str = "data", seq_axis: str = "model"):
    """Constrain (B, T, ...) so T is sharded over the mesh's ``seq_axis``.

    Returns ``x`` unchanged when no physical mesh context is active (the
    constraint is only resolvable inside ``with mesh:``) or the context mesh
    lacks the named axes — this keeps ``seq_parallel=True`` params usable in
    plain single-device jits.
    """
    if x.ndim < 2:
        return x
    spec = P(batch_axis, seq_axis, *([None] * (x.ndim - 2)))
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (RuntimeError, ValueError, KeyError):
        # no mesh context, or the context mesh has no such axes
        return x
