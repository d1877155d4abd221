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


def tp_shardings(tree, mesh: Mesh, min_size: int = 1024):
    """Tensor-parallel placement rule for a train-state pytree.

    Matrix-shaped leaves whose minor dim divides over the 'model' axis and
    that are large enough to be worth sharding get P(..., 'model'); all
    other leaves are replicated.  Applying one uniform rule to params AND
    optimizer moments keeps them co-sharded (adam's mu/nu mirror params).
    """
    n_model = mesh.shape["model"]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        size = getattr(leaf, "size", 0)
        if (len(shape) >= 2 and n_model > 1 and shape[-1] % n_model == 0
                and size >= min_size):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_train_state(tree, mesh: Mesh):
    """Place a train state: TP-shard large matrices, replicate the rest."""
    return jax.device_put(tree, tp_shardings(tree, mesh))


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
