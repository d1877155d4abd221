"""Sharding helpers: replication, batch sharding, constraint tagging."""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis across the 'data' mesh axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def with_model_sharding(x, mesh_axis: str = "model", dim: int = -1):
    """Tag an intermediate for sharding along a mesh axis (tensor parallel).

    Used inside jit-ted code; a no-op when no mesh is active.
    """
    try:
        ndim = x.ndim
        spec = [None] * ndim
        spec[dim] = mesh_axis
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except Exception:
        return x
