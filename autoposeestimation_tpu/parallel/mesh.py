"""Device mesh + sharding helpers.

The reference's only parallelism is single-host nn.DataParallel
(/root/reference/segmentation/__init__.py:69-83, DenseFusion/lib/network.py:33).
The TPU-native replacement is jax.sharding over an ICI mesh:

  * data parallelism: batch axis sharded over 'data'; parameters replicated;
    XLA inserts the psum gradient reduction automatically under jit,
  * tensor parallelism: the wide DenseFusion pointwise layers (256->512->1024
    fusion stacks and the 1408->640 heads) shard their output features over
    'model'; activations stay sharded until the per-point head outputs,
  * the two compose: a ('data', 'model') mesh scales batch x width.

Collectives ride ICI; no host round-trips. DCN/multi-host is out of scope at
this model scale (SURVEY.md §2.13).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """Build a mesh over the first n_devices devices; 'model' gets
    `model_parallel` devices, 'data' the rest."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axes)


def auto_mesh(mode: str = "auto", model_parallel: int = 1,
              n_devices: Optional[int] = None) -> Optional[Mesh]:
    """Trainer-facing data-parallel knob (SegConfig/DFConfig.data_parallel).

    'auto' engages a ('data', 'model') mesh over all visible devices when
    more than one is present — parity with the reference's automatic
    nn.DataParallel wrap (/root/reference/segmentation/__init__.py:69-83);
    'on' always builds the mesh; 'off' returns None (single-device steps).
    """
    if mode == "off":
        return None
    n = n_devices or len(jax.devices())
    if n <= 1 and mode != "on":
        return None
    return make_mesh(n_devices=n, model_parallel=model_parallel)


def shard_batch_data(mesh: Mesh, batch):
    """device_put a batch pytree for the training loops: arrays whose leading
    dim divides the 'data' axis shard over it, everything else (scalars, rng
    keys, ragged final batches) replicates. Keeps one compiled variant per
    sharding layout, correct for every batch."""
    ndata = mesh.shape["data"]

    def put(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[0] % ndata == 0 and shape[0] > 0:
            return jax.device_put(x, NamedSharding(
                mesh, P("data", *([None] * (len(shape) - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Device-put every array in a batch pytree with its leading axis over
    'data' (scalars replicated)."""
    def put(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, NamedSharding(
                mesh, P("data", *([None] * (x.ndim - 1)))))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)


def _tp_spec_for(path_str: str, leaf) -> P:
    """Tensor-parallel spec: shard wide Dense kernels/biases over 'model'.

    Kernels (in, out) with out >= 512 shard the output dim; their biases
    shard too. Everything else replicates. This covers the DenseFusion
    fusion stacks (512/1024) and head layers (640) — the layers holding
    ~90% of the pointwise FLOPs.
    """
    shape = np.shape(leaf)
    if "kernel" in path_str and len(shape) == 2 and shape[1] >= 512:
        return P(None, "model")
    if "bias" in path_str and len(shape) == 1 and shape[0] >= 512:
        return P("model")
    return P()


def shard_params_tp(mesh: Mesh, variables):
    """Device-put a flax variables pytree with tensor-parallel layout."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    leaves = []
    for path, leaf in flat:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = _tp_spec_for(path_str, leaf)
        leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def replicate_params(mesh: Mesh, variables):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), variables)
