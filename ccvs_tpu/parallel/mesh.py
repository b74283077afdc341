"""Device mesh construction and sharding helpers.

The reference scales with data parallelism only (`SURVEY.md` section 2.7;
apex DDP over NCCL, `tools/engine.py:71-74`). Here the same strategy is a
1-axis ``data`` mesh — but the mesh keeps a ``model`` axis available so the
GPT can be tensor-sharded (heads / mlp) when scaled beyond one chip's HBM,
without restructuring the train steps.

Multi-host: `jax.distributed.initialize()` + the same mesh spans slices; XLA
routes the gradient psum over ICI within a slice and DCN across slices.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """('data', 'model') mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % model_parallel == 0
    grid = np.asarray(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding (leading dim over 'data')."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with its leading axis sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(mesh: Mesh, tree):
    sh = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_batch(mesh: Optional[Mesh], batch):
    """Place a host batch on the mesh: arrays whose leading dim divides the
    'data' axis are sharded over it, everything else replicated.

    This is the trainers' single device-placement path (the stand-in for the
    reference Engine's DistributedSampler + DDP scatter,
    `tools/engine.py:71-101`): param pytrees stay replicated, batches ride
    the data axis, and the gradient all-reduce becomes XLA's implicit psum.
    """
    import jax.numpy as jnp

    if mesh is None:
        return jax.tree_util.tree_map(jnp.asarray, batch)
    n = mesh.shape["data"]
    dsh = data_sharding(mesh)
    repl = replicate(mesh)
    pc = jax.process_count()
    if pc > 1:
        # multi-host: each process holds only its PrefetchLoader shard
        # (global_batch / pc rows); assemble the global array without any
        # cross-host transfer — rows land on the local devices
        # (SURVEY section 2.8; reference per-rank split `tools/engine.py:81-101`).
        def put(x):
            x = np.asarray(x)
            if x.ndim >= 1 and x.shape[0] > 0:
                if (x.shape[0] * pc) % n == 0:
                    return jax.make_array_from_process_local_data(dsh, x)
                # Replicating a per-host batch shard would silently build a
                # "replicated" array whose buffers DIFFER across hosts
                # (divergent gradients); refuse instead.
                raise ValueError(
                    f"multi-host put_batch: array with leading dim "
                    f"{x.shape[0]} x {pc} hosts does not divide data axis "
                    f"{n}; pad the per-host batch or replicate it yourself "
                    f"if it is host-identical")
            return jax.make_array_from_process_local_data(repl, x)

        return jax.tree_util.tree_map(put, batch)

    def put(x):
        x = jnp.asarray(x)
        sh = dsh if (x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0) else repl
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def host_local_rows(arr):
    """This host's rows of a batch-sharded global array, plus their global
    row indices.

    ``np.asarray`` on a cross-host global array raises (not fully
    addressable), so multi-host writers — e.g. the generate CLI's
    ``save_batch`` (reference per-rank results,
    `tools/engine.py:81-101` + `helpers/generator.py:199-230`) — persist only
    the rows that live on their own devices, naming files by the returned
    GLOBAL row index so the union over hosts is the full batch with no
    duplicates. Shards replicated across a non-data axis are deduped by
    their global row offset. Single process: identity (all rows, 0..B-1).
    """
    seen = {}
    for s in arr.addressable_shards:
        start = (s.index[0].start or 0) if arr.ndim >= 1 else 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    starts = sorted(seen)
    rows = np.concatenate([seen[s] for s in starts], axis=0)
    ids = np.concatenate(
        [np.arange(s, s + seen[s].shape[0]) for s in starts])
    return rows, ids
