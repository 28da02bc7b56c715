"""Mesh + sharding-policy helpers."""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """2-D (data, model) mesh.  data = batch/frames, model = tensor split."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


# Parameter-name patterns that get tensor-parallel sharding on the last
# (output-features) axis, or the first (input-features) axis for the
# following contraction — the standard Megatron split for transformer blocks.
_COL_PARALLEL = re.compile(r"(qkv|fc1)$")
_ROW_PARALLEL = re.compile(r"(proj|fc2)$")


def param_pspec(path: str, value) -> P:
    """PartitionSpec for one parameter, keyed by its flax path.

    Only 2-D Dense kernels take the Megatron splits: PatchEmbed's conv is
    also named "proj", and row-sharding a (kh, kw, cin, cout) conv kernel
    would split the spatial axis (halo collectives every forward, and a cap
    of model_parallel <= kh)."""
    ndim = np.ndim(value)
    parts = path.split("/")
    owner = parts[-2] if len(parts) >= 2 else ""
    if ndim == 2 and _COL_PARALLEL.search(owner):
        return P(None, "model")
    if ndim == 2 and _ROW_PARALLEL.search(owner):
        return P("model", None)
    return P()


def tree_pspecs(params):
    """Pytree of PartitionSpecs matching `params` (flax FrozenDict or dict)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        out = []
        for k in kp:
            if hasattr(k, "key"):
                out.append(str(k.key))
            elif hasattr(k, "idx"):
                out.append(str(k.idx))
        return "/".join(out)

    specs = [param_pspec(path_str(kp), v) for kp, v in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    specs = tree_pspecs(params)
    return jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))), specs
