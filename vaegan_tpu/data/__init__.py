from vaegan_tpu.data import nifti
from vaegan_tpu.data.pipeline import (
    CachedDataset,
    DataLoader,
    NiftiDataset,
    SyntheticDataset,
    device_prefetch,
    make_dataset,
    make_loader,
)

__all__ = [
    "nifti", "NiftiDataset", "SyntheticDataset", "CachedDataset", "DataLoader",
    "device_prefetch", "make_dataset", "make_loader",
]
