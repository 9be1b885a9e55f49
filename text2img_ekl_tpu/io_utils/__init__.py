from .checkpoint import CheckpointManager, save_train_state, restore_train_state  # noqa: F401
from .images import make_grid, save_image_grid, save_single_images  # noqa: F401
from .logging import MetricsLogger  # noqa: F401
