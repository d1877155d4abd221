from .coupling import AdditiveCoupling, AffineCoupling  # noqa: F401
from .elementwise import Arctanh, Identity, Logit, Sigmoid, Tanh  # noqa: F401
from .norm import ActNorm, BatchNorm  # noqa: F401
from .squeeze import (Flatten, Squeeze1d, Squeeze2d,  # noqa: F401
                      Unsqueeze1d, Unsqueeze2d)
