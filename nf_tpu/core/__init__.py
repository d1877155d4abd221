from .bijector import Bijector, Chain, Ctx, Inverted, Variables, empty_variables  # noqa: F401
