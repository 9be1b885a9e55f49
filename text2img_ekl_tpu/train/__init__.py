from .losses import bce, ce_loss, kl_loss, nll_loss  # noqa: F401
from .state import TrainState, create_train_state  # noqa: F401
from .step import make_train_step, make_sample_fn  # noqa: F401
