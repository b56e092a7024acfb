from mri_inr_tpu.data import kspace, synthetic
from mri_inr_tpu.data.dataset import MRIDataset, MRISampler

__all__ = ["kspace", "synthetic", "MRIDataset", "MRISampler"]
