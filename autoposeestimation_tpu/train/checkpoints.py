"""Checkpointing: best-metric checkpoints with full training state.

Reproduces the reference's artifact contract (SURVEY.md §5.4): segmentation
saves a rich dict (state + configs + curves) as
`segmentation/trained_models/<ds>/Unet_resnet34.ckpt` and DenseFusion saves
`pose_model.pth` / `pose_refine_model.pth` on best test distance. Our
artifacts use the same paths with an `.npz` suffix (flax pytrees flattened to
named arrays + a JSON sidecar for metadata) — framework-neutral, no pickle.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[prefix + key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, variables: Any,
                    meta: Optional[Dict] = None,
                    opt_state: Any = None) -> None:
    """Writes <path> (.npz appended if absent) + <path>.meta.json."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = _flatten(variables, "v/")
    if opt_state is not None:
        arrays.update(_flatten(opt_state, "o/"))
    np.savez(path, **arrays)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def _unflatten(arrays: Dict[str, np.ndarray], like: Any, prefix: str) -> Any:
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in paths:
        key = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = arrays[key]
        leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_checkpoint(path: str, like_variables: Any = None,
                    like_opt_state: Any = None) -> Dict:
    """Returns {'variables': ..., 'opt_state': ..., 'meta': ...}.

    Without a `like_variables` template, returns a flat {name: array} dict
    nested back into a pytree-of-dicts by splitting on '/'.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = dict(np.load(path, allow_pickle=False))
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)

    def nest(prefix: str) -> Any:
        out: Dict = {}
        for key, arr in data.items():
            if not key.startswith(prefix):
                continue
            parts = key[len(prefix):].split("/")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
        return out

    if like_variables is not None:
        variables = _unflatten(data, like_variables, "v/")
    else:
        variables = nest("v/")
    opt_state = None
    if like_opt_state is not None:
        opt_state = _unflatten(data, like_opt_state, "o/")
    elif any(k.startswith("o/") for k in data):
        opt_state = nest("o/")
    return {"variables": variables, "opt_state": opt_state, "meta": meta}
