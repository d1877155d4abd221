from .conditioners import MLP, ConvNet, ResBlock2d, ResBlockLinear  # noqa: F401
from .core import Activation, Net, Sequential  # noqa: F401
from .layers import BatchNormNet, Conv2d, Dense  # noqa: F401
