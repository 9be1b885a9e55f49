"""text2img_ekl_tpu — TPU-native re-build of Multimodal-Group/Text2img_EKL.

A JAX/XLA/Pallas framework for multi-stage text-to-image GANs with EKL class
distillation losses: conditioning augmentation (CA), variational conditional
manifolds (VC), split-z latents, capsule routing heads, joint three-headed
discriminators, and on-device Inception Score / FID evaluation — designed
SPMD-first over `jax.sharding.Mesh` instead of the reference's
single-process CUDA DataParallel.
"""

__version__ = '0.1.0'

import os as _os

# Opt-in persistent XLA compilation cache (works on both the CPU test
# backend and the axon TPU backend, measured in PERF.md "Compilation
# cache"): T2I_JAX_CACHE=<dir> makes every process reuse prior AOT
# results — repeat bench/CLI launches skip the multi-minute fused-step
# compile. Opt-in so default runs surface true compile times.
if _os.environ.get('T2I_JAX_CACHE'):
    import jax as _jax
    _jax.config.update('jax_compilation_cache_dir',
                       _os.environ['T2I_JAX_CACHE'])
    _jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from .config import Config, cfg_from_file  # noqa: F401
