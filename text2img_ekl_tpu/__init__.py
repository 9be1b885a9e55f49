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


def enable_compilation_cache(cache_dir=None) -> bool:
    """Opt-in persistent XLA compilation cache (works on both the CPU
    test backend and the axon TPU backend, measured in PERF.md
    "Compilation cache"): point T2I_JAX_CACHE (or ``cache_dir``) at a
    directory and every process reuses prior AOT results — repeat
    bench/CLI/test launches skip the multi-minute fused-step compiles.
    Opt-in so default runs surface true compile times. The single
    authority for the knob: the package applies it on import and
    tests/conftest.py calls it explicitly."""
    cache_dir = cache_dir or _os.environ.get('T2I_JAX_CACHE')
    if not cache_dir:
        return False
    import jax
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    # persist only compiles that took real work, so trivial programs
    # don't bloat the cache directory
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    return True


enable_compilation_cache()

from .config import Config, cfg_from_file  # noqa: F401
