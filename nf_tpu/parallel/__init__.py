from .mesh import make_mesh  # noqa: F401
from .sharding import replicate, shard_batch  # noqa: F401
