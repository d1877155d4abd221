from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .trainer import TrainState, Trainer, make_optimizer  # noqa: F401
