from .elementwise import Arctanh, Identity, Logit, Sigmoid, Tanh  # noqa: F401
