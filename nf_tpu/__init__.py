"""nf_tpu — a TPU-native normalizing-flows framework (JAX/XLA/Pallas).

Built from scratch with the capability surface of the reference
``tatsy/normalizing-flows-pytorch`` (see SURVEY.md): seven flow families over
a shared invertible-bijector algebra, trained by maximum likelihood, with
mesh-sharded data parallelism and Pallas kernels for the hot ops.
"""
from .core import Bijector, Chain, Ctx, Inverted  # noqa: F401

__version__ = "0.1.0"
