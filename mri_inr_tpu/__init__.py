"""mri_inr_tpu — TPU-native modulated-SIREN MRI reconstruction framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference MatteoWohlrapp/mri-inr (PyTorch, single GPU): fastMRI k-space
undersampling, overlapping-patch tiling, CNN-encoded latent modulations,
and dense modulated-SIREN evaluation — built TPU-first:

- compute path: jit/pjit over a ``jax.sharding.Mesh``, bf16-on-MXU matmuls,
  a fused Pallas modulated-SIREN kernel, MXU matmul-DFT for centered FFTs;
- static shapes everywhere (black-patch handling is a mask, not ragged
  filtering);
- data-parallel training over the patch batch and pod-parallel evaluation
  over validation files.
"""

__version__ = "0.1.0"
