"""Multi-chip parallelism: device meshes and sharding helpers.

The LSA hot loop is data-parallel over rays: the ray batch shards over the
``data`` mesh axis while MLP weights/scales replicate (they are tiny), so the
only collective XLA inserts is the gradient psum over ICI. A ``model`` axis
is supported for tensor-parallel sharding of the MLP hidden dimension
(useful only at much larger widths, but exercised by the multi-chip dry run).

The reference is strictly single-GPU (reference: README.md:76, main.sh:13);
this module is the TPU-native replacement designed per SURVEY §2.3.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Create a device mesh. Defaults to all devices on one 'data' axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            # favor the data axis; model axis gets the smaller factor
            m = 1
            for cand in (2, 4, 8):
                if n % cand == 0 and cand <= n:
                    m = cand
                    break
            shape = (n // m, m)
        else:
            raise ValueError("give an explicit shape for >2 axes")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_inputs(mesh: Mesh, *arrays):
    """Device-put host batches with the leading axis sharded over 'data'."""
    sh = data_sharding(mesh)
    return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)


def shard_scan_inputs(mesh: Mesh, packed, keys):
    """Place a scan-batched LSA input stack on the mesh: the (K, N, 12)
    packed ray batches shard their RAY axis (axis 1) over 'data'; the scan
    axis K and the (K, 2) PRNG keys replicate. Keeps lax.scan's K-steps-per-
    dispatch amortization under a mesh (train/lsa.py scan path)."""
    packed = jax.device_put(
        jnp.asarray(packed), NamedSharding(mesh, P(None, "data", None)))
    keys = jax.device_put(jnp.asarray(keys), replicated(mesh))
    return packed, keys


def replicate_params(mesh: Mesh, tree):
    """Replicate a parameter pytree across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), sh), tree)


def shard_params_tp(mesh: Mesh, params):
    """Tensor-parallel placement of NeRF MLP params: hidden (output) dim of
    each layer sharded over 'model' where divisible, else replicated."""
    axis = mesh.shape.get("model", 1)

    def place(path_leaf):
        a = jnp.asarray(path_leaf)
        if a.ndim == 2 and a.shape[1] % axis == 0:
            spec = P(None, "model")
        elif a.ndim == 1 and a.shape[0] % axis == 0:
            spec = P("model")
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)
