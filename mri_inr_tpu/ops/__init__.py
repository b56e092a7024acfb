from mri_inr_tpu.ops import tiling

__all__ = ["tiling"]
