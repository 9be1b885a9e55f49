from .datasets import (  # noqa: F401
    TextDataset, ImageFolderDataset, LSUNClassDataset, SyntheticTextDataset)
from .loader import DataLoader  # noqa: F401
from .transforms import (  # noqa: F401
    bbox_crop, build_train_transform, build_eval_transform, multiscale_pyramid)
