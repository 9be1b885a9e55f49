"""text2img_ekl_tpu — TPU-native re-build of Multimodal-Group/Text2img_EKL.

A JAX/XLA/Pallas framework for multi-stage text-to-image GANs with EKL class
distillation losses: conditioning augmentation (CA), variational conditional
manifolds (VC), split-z latents, capsule routing heads, joint three-headed
discriminators, and on-device Inception Score / FID evaluation — designed
SPMD-first over `jax.sharding.Mesh` instead of the reference's
single-process CUDA DataParallel.
"""

__version__ = '0.1.0'

from .config import Config, cfg_from_file  # noqa: F401
