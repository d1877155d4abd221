from .mesh import make_mesh  # noqa: F401
from .sharding import replicate, shard_batch, shard_train_state, tp_shardings  # noqa: F401
