"""Serialized serving artifacts via jax.export (StableHLO).

The reference has no deployment story beyond "run the torch module in
this repo's python environment"; here the eval sampler — generator
forward + image decode + uint8 quantization, weights baked in as
constants — exports to one portable StableHLO blob
(`jax.export.serialize`) that any later JAX runtime can deserialize and
compile for its local backend (TPU serving included) without the model
code, the config system, or a checkpoint at hand:

    exported = make_serving_exported(cfg, G, g_variables, batch_size)
    blob = exported.serialize()            # bytes -> ship to serving
    ...
    fn = jax.export.deserialize(blob).call
    imgs = fn(raw_key_uint32x2, noise, *cond)   # tuple of uint8 stages

Inputs (all shapes static, fixed at export time):
  key    uint32[2]  raw PRNG key (reparameterization + cls_prior draws)
  noise  f32[B, Z_DIM]
  cond   per strategy (see serving_cond_shapes): COCO single-cond takes
         cat(txt, multi_hot)[B, TEXT+ENTITY+1]; the split-z families
         take (txt[B, TEXT], cls_onehot[B, ENTITY]); unconditional GNet
         takes nothing.

Outputs: one uint8 NHWC image array per stage (64px, 128px, ...).

Batch-size note: serving at a different batch size means re-exporting
(XLA static shapes); export several sizes if the server bucketizes.
Multi-chip serving shards the batch axis OUTSIDE the artifact (it is a
pure per-replica program — no collectives in the eval sampler).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def serving_cond_shapes(cfg, batch_size: int) -> List[jax.ShapeDtypeStruct]:
    """Condition-argument shapes for a config's serving signature."""
    f32 = jnp.float32
    B = batch_size
    if not cfg.GAN.B_CONDITION:
        return []
    if cfg.DATASET_NAME == 'coco':
        return [jax.ShapeDtypeStruct(
            (B, cfg.TEXT.DIMENSION + cfg.GAN.ENTITY_DIM + 1), f32)]
    return [jax.ShapeDtypeStruct((B, cfg.TEXT.DIMENSION), f32),
            jax.ShapeDtypeStruct((B, cfg.GAN.ENTITY_DIM), f32)]


def make_serving_exported(cfg, G, g_variables: Dict[str, Any],
                          batch_size: int, tpu_only: bool = False):
    """Export the eval sampler with the weights baked in.

    Returns a jax.export.Exported; call `.serialize()` for the portable
    bytes. Eval-mode BatchNorm (running averages), matching
    `netG.eval()` under cfg.TEST.EVAL_MODE
    (cub_trainer_splitz_cap_ca.py:817).

    Portability vs Pallas: jax.export lowers only for the requested
    platforms, and the fused Pallas capsule kernel has no CPU lowering.
    The default artifact is PORTABLE (platforms cpu+tpu): the generator
    is cloned with ``use_pallas=False`` — identical parameters, the
    pure-JAX routing path (ops/capsule.py, the semantic reference the
    kernel is parity-tested against). ``tpu_only=True`` keeps the
    Pallas kernels and lowers for TPU alone.
    """
    from jax import export as jexport

    from ..train.step import _pm1_to_uint8_dev, _sample_core

    if not tpu_only and getattr(G, 'use_pallas', False):
        G = G.clone(use_pallas=False)
    sample = _sample_core(G, train_mode=False)
    g_variables = jax.tree.map(jnp.asarray, g_variables)

    def serve(key, noise, *cond):
        imgs = sample(g_variables, key, noise, *cond)
        return tuple(_pm1_to_uint8_dev(i) for i in imgs)

    args = [jax.ShapeDtypeStruct((2,), jnp.uint32),
            jax.ShapeDtypeStruct((batch_size, cfg.GAN.Z_DIM), jnp.float32)]
    args += serving_cond_shapes(cfg, batch_size)
    # platforms: without this, jax.export lowers for the EXPORT-TIME
    # backend only and Exported.call refuses other platforms — the
    # portability story depends on requesting both here.
    platforms = ('tpu',) if tpu_only else ('cpu', 'tpu')
    return jexport.export(jax.jit(serve), platforms=platforms)(*args)


def load_serving(blob: bytes):
    """bytes -> callable(key, noise, *cond) -> tuple of uint8 images."""
    from jax import export as jexport

    return jexport.deserialize(blob).call
