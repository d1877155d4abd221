"""Data tier: toy samplers (numpy + native C++), image readers, and the
step-driven sharded FlowDataLoader."""
from . import native  # noqa: F401
from .images import IMAGE_DATASETS, load_images, synthetic_images  # noqa: F401
from .loader import POOL_SIZE, FlowDataLoader  # noqa: F401
from .toy import TOY_SAMPLERS  # noqa: F401
