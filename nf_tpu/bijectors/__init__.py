from .coupling import AdditiveCoupling, AffineCoupling  # noqa: F401
from .elementwise import Arctanh, Identity, Logit, Sigmoid, Tanh  # noqa: F401
from .norm import ActNorm, BatchNorm  # noqa: F401
from .squeeze import Squeeze1d, Squeeze2d, Unsqueeze1d, Unsqueeze2d  # noqa: F401
