from vaegan_tpu.data import nifti
from vaegan_tpu.data.pipeline import (
    DataLoader,
    NiftiDataset,
    SyntheticDataset,
    device_prefetch,
    make_dataset,
    make_loader,
)

__all__ = [
    "nifti", "NiftiDataset", "SyntheticDataset", "DataLoader",
    "device_prefetch", "make_dataset", "make_loader",
]
