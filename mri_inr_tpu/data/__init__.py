from mri_inr_tpu.data import kspace, synthetic
from mri_inr_tpu.data.dataset import MRIDataset, MRIDatasetLowMemory, MRISampler
from mri_inr_tpu.data.online import OnlineKspaceDataset, OnlineSampler

__all__ = [
    "kspace",
    "synthetic",
    "MRIDataset",
    "MRIDatasetLowMemory",
    "MRISampler",
    "OnlineKspaceDataset",
    "OnlineSampler",
]
