from .pipeline import (
    create_dataloader,
    get_transform,
    load_and_preprocess_dataset,
)
from .synthetic import SyntheticImageDataset
