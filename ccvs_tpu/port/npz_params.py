"""Flat-npz persistence for parameter pytrees.

Orbax checkpoints are directory trees, which makes them awkward to ship in a
git repo or hand between machines; the reference ships single-file `.pth`
weights instead (reference models/__init__.py:5-26). This module provides the
single-file equivalent for ccvs_tpu pytrees: flatten a (possibly nested)
flax/dict param tree into `prefix/a/b/c`-keyed numpy arrays inside one
compressed npz, and rebuild the nested dict on load. Multiple trees share one
file via distinct prefixes.

Storage dtype is fp16 by default (half the footprint; inference-grade
precision — training state should stay in orbax fp32 checkpoints).
"""

from typing import Any, Dict, Optional

import numpy as np


def flatten_params(tree: Any, prefix: str = "",
                   dtype: Optional[np.dtype] = np.float16) -> Dict[str, np.ndarray]:
    """Flatten a param pytree to `{prefix/a/b: array}` (cast to ``dtype``).

    Integer/bool leaves keep their dtype: only floating leaves are cast.
    """
    from flax import serialization

    out = {}

    def rec(d, pre):
        for k, v in d.items():
            if "/" in str(k):
                raise ValueError(f"param key {k!r} contains '/'")
            key = f"{pre}/{k}" if pre else str(k)
            if isinstance(v, dict):
                rec(v, key)
            else:
                a = np.asarray(v)
                if dtype is not None and np.issubdtype(a.dtype, np.floating):
                    a = a.astype(dtype)
                out[key] = a

    rec(serialization.to_state_dict(tree), prefix)
    return out


def unflatten_params(flat: Dict[str, np.ndarray], prefix: str = "",
                     dtype: Optional[np.dtype] = np.float32) -> Dict[str, Any]:
    """Rebuild the nested dict for keys under ``prefix`` (cast floats to
    ``dtype``). With an empty prefix, rebuilds everything."""
    root: Dict[str, Any] = {}
    pre = prefix + "/" if prefix else ""
    for key, v in flat.items():
        if pre and not key.startswith(pre):
            continue
        parts = key[len(pre):].split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        a = np.asarray(v)
        if dtype is not None and np.issubdtype(a.dtype, np.floating):
            a = a.astype(dtype)
        d[parts[-1]] = a
    return root


def save_params_npz(path: str, **trees: Any) -> None:
    """Save named param trees into one compressed npz:
    ``save_params_npz(p, ae_gen=..., gpt=...)``."""
    flat: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        flat.update(flatten_params(tree, name))
    np.savez_compressed(path, **flat)


def update_params_npz(path: str, **trees: Any) -> None:
    """Merge-write named trees into ``path`` atomically.

    Existing trees whose prefix is not being replaced are preserved, so two
    trainers can mirror into ONE committable file (frame-AE writes ``ae_gen``,
    the transformer later merges ``gpt`` without losing it — the durability
    bar is the reference's per-iteration `save_network`,
    reference models/__init__.py:5-26). The write goes to a ``.tmp`` sibling
    and is renamed into place, so a kill mid-write never corrupts the last
    good file.
    """
    import os

    flat: Dict[str, np.ndarray] = {}
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                for key in z.files:
                    if key.split("/", 1)[0] not in trees:
                        flat[key] = z[key]
        except (OSError, ValueError):
            pass  # prior file corrupt/partial: overwrite with fresh trees
    for name, tree in trees.items():
        flat.update(flatten_params(tree, name))
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)


def load_params_npz(path: str, *names: str) -> Dict[str, Any]:
    """Load named param trees saved by :func:`save_params_npz`."""
    with np.load(path) as z:
        flat = dict(z)
    found = {key.split("/", 1)[0] for key in flat}
    out = {}
    for name in names:
        if name not in found:
            raise KeyError(f"{path} has no tree {name!r} (has {sorted(found)})")
        out[name] = unflatten_params(flat, name)
    return out
