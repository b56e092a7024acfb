from mri_inr_tpu.utils import profiling, visualization

__all__ = ["profiling", "visualization"]
