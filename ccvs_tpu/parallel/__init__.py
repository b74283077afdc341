"""SPMD parallelism over jax.sharding meshes.

Replaces the reference's 140-line NCCL/SLURM/apex engine (`tools/engine.py`)
with mesh + named shardings; gradient all-reduce, loss pmean, and the ADA
controller psum all become implicit XLA collectives over ICI.
"""

from ccvs_tpu.parallel.fsdp import fsdp_param_specs, shard_fsdp
from ccvs_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    put_batch,
    replicate,
    replicate_tree,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate",
    "replicate_tree",
    "shard_batch",
    "put_batch",
    "fsdp_param_specs",
    "shard_fsdp",
]
