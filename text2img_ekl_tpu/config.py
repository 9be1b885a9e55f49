"""Typed configuration tree for the TPU-native Text2img_EKL framework.

Mirrors the reference schema (reference: miscc/config.py:13-77) so that the
reference's ``cfg/*.yml`` files load verbatim, with the same strict-merge
semantics: unknown keys raise ``KeyError`` (miscc/config.py:92) and type
mismatches raise ``ValueError`` (miscc/config.py:100).

Unlike the reference's mutable module-level singleton, configs here are
explicit objects passed to constructors; a module-level default instance is
still provided for CLI convenience.
"""

from __future__ import annotations

import copy
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass
class TreeConfig:
    """Multi-stage image pyramid (reference: miscc/config.py:23-26)."""

    BRANCH_NUM: int = 3
    BASE_SIZE: int = 64
    SCALE: int = 2


@dataclass
class TestConfig:
    """Test/sampling options (reference: miscc/config.py:30-35)."""

    B_EXAMPLE: bool = True
    SAMPLE_NUM: int = 30000
    EVAL_MODE: bool = True
    G_CAPSULE: bool = False
    CLS_PRIOR: bool = False
    # Surfaces the reference's hard-coded ``cls_share`` local: the 10
    # captions of an image share one fixed N(0,1) class prior
    # (cub_trainer_splitz_cap_ca.py:810-812,866-867). Only meaningful with
    # CLS_PRIOR=True.
    CLS_SHARE: bool = False


@dataclass
class CoeffConfig:
    """Loss coefficients (reference: miscc/config.py:58-61)."""

    KL: float = 2.0
    UNCOND_LOSS: float = 0.0
    COLOR_LOSS: float = 0.0


@dataclass
class TrainConfig:
    """Training options (reference: miscc/config.py:39-61)."""

    BATCH_SIZE: int = 64
    VIS_COUNT: int = 64
    MAX_EPOCH: int = 600
    SNAPSHOT_INTERVAL: int = 2000
    DISCRIMINATOR_LR: float = 2e-4
    GENERATOR_LR: float = 2e-4
    FLAG: bool = True
    NET_G: str = ''
    ENTITY_NET_G: str = ''
    NET_D: str = ''
    ENTITY_NET_D: str = ''
    BIG_EVAL: bool = False
    G_CAPSULE: bool = False
    D_CAPSULE: bool = False
    CAT_Z: str = 'concat'
    EXCHANGE: bool = False
    GENERAL_IS: bool = False
    COEFF: CoeffConfig = field(default_factory=CoeffConfig)


@dataclass
class GanConfig:
    """Model dimensions (reference: miscc/config.py:65-74)."""

    EMBEDDING_DIM: int = 128
    DF_DIM: int = 64
    GF_DIM: int = 64
    Z_DIM: int = 100
    NETWORK_TYPE: str = 'default'
    R_NUM: int = 2
    B_CONDITION: bool = False
    ENTITY_DIM: int = 200
    MANIFD_DIM: int = 128


@dataclass
class TextConfig:
    """Text embedding dims (reference: miscc/config.py:76-77)."""

    DIMENSION: int = 1024


@dataclass
class Config:
    """Top-level config (reference: miscc/config.py:9-77).

    TPU-native additions live under names absent from the reference schema and
    are prefixed TPU_* so reference YAMLs can never collide with them; they are
    also mergeable from YAML for new-style configs.
    """

    DATASET_NAME: str = 'birds'
    EMBEDDING_TYPE: str = 'cnn-rnn'
    CONFIG_NAME: str = ''
    DATA_DIR: str = ''
    GPU_ID: str = '0'
    CUDA: bool = True
    WORKERS: int = 6
    TREE: TreeConfig = field(default_factory=TreeConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    GAN: GanConfig = field(default_factory=GanConfig)
    TEXT: TextConfig = field(default_factory=TextConfig)

    # --- TPU-native extensions (not present in the reference schema) ---
    # Compute dtype for conv/matmul ('bfloat16' or 'float32').
    TPU_COMPUTE_DTYPE: str = 'bfloat16'
    # BatchNorm IO dtype. 'bfloat16' halves BN-boundary HBM traffic (+14%
    # step throughput); reductions/statistics accumulate in f32 either way.
    # Default flipped to bfloat16 in round 3 on the trajectory-statistics
    # evidence (tools/bn_dtype_convergence.py, PERF.md: matching loss bands
    # and means over 200 same-seed steps, spikes self-recover in both).
    # Set 'float32' for bit-faithful reference BN numerics.
    TPU_BN_DTYPE: str = 'bfloat16'
    # Number of data-parallel shards ('auto' = all local devices).
    TPU_DATA_PARALLEL: int = 0  # 0 => use every available device
    # Multi-device SPMD strategy: 'shard_map' (hand-SPMD, per-replica
    # BatchNorm stats — DataParallel-faithful) or 'gspmd' (plain jit with
    # sharding annotations; XLA partitions and inserts collectives, BN
    # becomes global-batch/sync statistics). 'gspmd' is the one-flag
    # fallback for backends whose AOT path executes hand-SPMD programs
    # slowly (PERF.md pitfall 1).
    TPU_SPMD_MODE: str = 'shard_map'
    # Group the D phase's real/wrong/fake tower passes into one vmapped
    # forward with per-group BatchNorm statistics (numerically equivalent
    # to the three sequential passes; running averages combined exactly).
    # Default off: measured 5% SLOWER than the sequential passes on the
    # v5e (2080 vs 2187 img/s at bs128) with ~2x the compile time — the
    # vmapped program batches the convs but serializes worse through the
    # capsule kernels and conv emitters (PERF.md).
    TPU_GROUPED_D: bool = False
    # ZeRO-1-style cross-replica weight-update sharding on the shard_map
    # path (after "Automatic Cross-Replica Sharding of Weight Update in
    # Data-Parallel Training", arXiv:2004.13336): gradients reduce_scatter
    # into per-device shards, Adam runs on 1/N of the moments per device,
    # updated deltas all_gather back — optimizer state holds one global
    # copy sharded over the data axis instead of N replicas. Numerically
    # equivalent to replicated Adam (tested on the virtual mesh). The
    # optimizer-state pytree shape depends on the topology (flat moments
    # padded to the device count), but checkpoints interchange freely:
    # restore auto-migrates the moments across mesh sizes and across this
    # flag (io_utils/checkpoint.restore_train_state ->
    # train/state.migrate_opt_state, bit-exact modulo padding).
    TPU_SHARDED_ADAM: bool = False
    # Fuse the BatchNorm normalize + GLU tail into one Pallas pass
    # (ops/bn_glu.py): skips the full-width normalized-tensor
    # materialization between BN and GLU. Checkpoint-identical parameters.
    TPU_FUSED_BN_GLU: bool = False
    # NextStageG joint conv: True = tile-free exact rewrite of the
    # condition concat (default; +8.6% on the flagship step, PERF.md);
    # False = the materialized-concat formulation. Parameters identical.
    TPU_SPLIT_JOINTCONV: bool = True
    # UpBlock: fold the nearest-2x upsample into the conv weights
    # (conv3x3(up2x(x)) == depth_to_space(conv3x3(x, W4)) with W4 built
    # from 2D partial sums of W per output parity — exact rewrite,
    # parameters identical). Reads x once instead of the 4x-materialized
    # upsample; the layer-level fwd+bwd measured 12% faster while fwd
    # alone is slower (relayout cost), so the fold applies to train-mode
    # calls only. See PERF.md "Subpixel upsample-conv".
    TPU_SUBPIXEL_UP: bool = False
    # 3x3 convs: weight gradient via the Pallas streaming-dW kernel
    # (ops/conv_dw.py) where the geometry supports it. Measured and
    # rejected on the v5e (0.66-1.03x isolated vs XLA's own dW emitter;
    # flagship E2E 1,352 vs 2,180 img/s, the custom-call boundary also
    # blocks surrounding fusions — PERF.md "Pallas dW kernel"); off by
    # default, kept as an A/B escape hatch for other hardware.
    # Parameters identical.
    TPU_PALLAS_DW: bool = False
    # Rematerialize the generator forward in its backward pass
    # (jax.checkpoint around the saved-VJP forward in the fused step):
    # '' = off (save every residual, the default), 'full' = save nothing
    # and recompute the whole forward, 'conv' = save only conv outputs
    # (checkpoint_name-tagged in nn/blocks.py) and recompute the BN/GLU
    # elementwise chains inside the backward where they fuse into its
    # conv kernels. Trades idle-MXU FLOPs for activation HBM traffic —
    # the step is HBM-bound at ~74% of peak (PERF.md).
    TPU_REMAT_G: str = ''
    # xla_tpu_scoped_vmem_limit_kib for the fused train step (0 = compiler
    # default). Conv emitters budget their scratch against this; the v5e's
    # physical VMEM is far above the default (PERF.md).
    TPU_SCOPED_VMEM_KIB: int = 0
    # Extra backend-compiler options for the fused train step (merged
    # with the scoped-vmem knob above); the only channel that reaches the
    # remote AOT compiler (XLA_FLAGS is rejected by the local client).
    # Swept by tools/sweep_compiler_flags.py.
    TPU_COMPILER_OPTIONS: Optional[dict] = None
    # Feed image pyramids host->device as raw uint8 and normalize
    # on-device (x/127.5-1, bit-identical to the host ToTensor+Normalize
    # since 2/255 == 1/127.5): 4x less host memory bandwidth, loader
    # slab size, and H2D transfer per step. The step accepts either
    # dtype; this flag controls what the datasets/loaders emit.
    TPU_UINT8_INPUT: bool = True
    # Gradient accumulation over k microbatches per step (0/1 = off).
    # Each microbatch is a VIRTUAL data-parallel replica: per-microbatch
    # BatchNorm statistics, RNG folded by virtual replica index
    # (axis_index*k + j), gradients/running-stats/metrics averaged before
    # the single Adam update — so (mesh n, accum k) reproduces a mesh n*k
    # run's numerics exactly (tested vs the 8-device virtual mesh). Use it
    # to (a) rehearse/debug a big-mesh run's numerics on fewer chips, or
    # (b) run an effective batch that doesn't fit HBM — for (b) you MUST
    # combine with TPU_REMAT_G: the k microbatches unroll into one XLA
    # program whose phase-1 VJP residuals all stay live until their
    # phase-3 use, so without remat peak activation memory equals the
    # full-batch run (the step prints a warning), and compile time
    # scales ~linearly with k. Batch size must be divisible by k.
    TPU_GRAD_ACCUM: int = 0
    # Capsule routing: 'dynamic' (routing-by-agreement) or 'k_means'.
    TPU_CAPSULE_ROUTING: str = 'dynamic'
    TPU_CAPSULE_ITERATIONS: int = 3
    # Use the fused Pallas TPU kernel for capsule routing when on TPU.
    TPU_CAPSULE_PALLAS: bool = True
    # Synthetic data fallback when DATA_DIR has no dataset on disk.
    TPU_SYNTHETIC_DATA: bool = False
    # Decode JPEG batches through the native C++ pipeline
    # (native/dataloader.cpp) instead of per-item PIL; falls back to PIL
    # when the library cannot build (no g++/libjpeg).
    TPU_NATIVE_DECODE: bool = True
    # Steps between on-device inception-score prediction batches (the
    # reference evaluates every other step; cub_trainer_splitz_cap_ca.py:614).
    # <=0 or an interval longer than the run disables the stream entirely.
    TPU_IS_EVERY: int = 2
    # Generator EMA decay (0 disables; the reference's avg_param_G update is
    # commented out, cub_trainer_splitz_cap_ca.py:609-610, so 0 is faithful;
    # 0.999 matches the reference's dormant formula).
    TPU_EMA_DECAY: float = 0.0
    # Evaluate/export with the EMA weights when the restored state carries
    # them (reference save_model writes avg_param_G into the .pth,
    # cub_trainer_splitz_cap_ca.py:218-228, so an averaged run's eval
    # weights ARE the averages). False scores the live weights instead.
    TPU_EMA_EVAL: bool = True
    # Capture a jax.profiler trace for steps [3, 8) of the first epoch into
    # <output>/Log/profile (view with tensorboard / xprof).
    TPU_PROFILE: bool = False
    # Keep at most this many epoch snapshots on disk (oldest pruned after
    # each save); IS-gated "good model" saves are always kept. 0 keeps
    # everything — the reference's behavior (it never deletes a .pth,
    # cub_trainer_splitz_cap_ca.py:662-667), but our snapshots hold the
    # FULL TrainState (G+D params, BN stats, Adam moments), so a
    # 300-epoch run writes ~130 of them; bound this for long runs.
    TPU_KEEP_CHECKPOINTS: int = 0
    # Offline evaluate (TRAIN.FLAG false): score the sampled images
    # directly on device (IS, plus FID when TPU_EVAL_FID_STATS names a
    # real-set .npz) instead of the reference's 30k-PNG disk round trip
    # (cub_trainer_splitz_cap_ca.py:776-911 then is_of_dir.py). Scores
    # land in <eval dir>/direct_scores.json; the PNG protocol stays the
    # default and the B_EXAMPLE super-grid path always writes files.
    TPU_EVAL_DIRECT: bool = False
    # Precomputed real-set FID statistics (.npz with mu/sigma) for the
    # direct eval path; empty skips FID.
    TPU_EVAL_FID_STATS: str = ''

    # ------------------------------------------------------------------
    @property
    def imsize(self) -> int:
        """Top-stage image size (reference: main.py:109)."""
        return self.TREE.BASE_SIZE * (self.TREE.SCALE ** (self.TREE.BRANCH_NUM - 1))

    def branch_sizes(self) -> list:
        """Per-branch image sizes, e.g. [64, 128, 256]."""
        return [self.TREE.BASE_SIZE * (self.TREE.SCALE ** i)
                for i in range(self.TREE.BRANCH_NUM)]

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def replace(self, **kw) -> 'Config':
        return dataclasses.replace(self, **kw)


def _merge_dict_into_dataclass(src: Dict[str, Any], dst: Any, path: str = '') -> None:
    """Strict recursive merge with the reference's error semantics.

    Reference behaviour (miscc/config.py:80-112): a key absent from the
    defaults raises KeyError; a type mismatch between the YAML value and the
    default raises ValueError; nested dicts merge recursively.
    """
    if not isinstance(src, dict):
        return
    valid = {f.name: f for f in dataclasses.fields(dst)}
    for k, v in src.items():
        if k not in valid:
            raise KeyError('{} is not a valid config key'.format(k))
        old = getattr(dst, k)
        if dataclasses.is_dataclass(old):
            if not isinstance(v, dict):
                raise ValueError(
                    'Type mismatch ({} vs. {}) for config key: {}'.format(
                        type(old), type(v), k))
            try:
                _merge_dict_into_dataclass(v, old, path + k + '.')
            except Exception:
                print('Error under config key: {}'.format(k))
                raise
            continue
        old_type = type(old)
        if old_type is not type(v):
            # Permit the numeric coercions YAML naturally produces, exactly
            # like the reference permits np.ndarray coercion: int -> float
            # for float-typed defaults (YAML '2e-4' parses fine but '1.0'
            # vs int defaults must still error, as in the reference).
            if old_type is float and isinstance(v, int) and not isinstance(v, bool):
                v = float(v)
            else:
                raise ValueError(
                    'Type mismatch ({} vs. {}) for config key: {}'.format(
                        old_type, type(v), k))
        setattr(dst, k, v)


def cfg_from_file(filename: str, base: Config = None) -> Config:
    """Load a YAML file and merge it into a fresh (or given) Config.

    Mirrors reference ``cfg_from_file`` (miscc/config.py:115-121) but returns
    the config instead of mutating a module global.
    """
    import yaml

    with open(filename, 'r') as f:
        yaml_cfg = yaml.safe_load(f)
    out = copy.deepcopy(base) if base is not None else Config()
    if yaml_cfg:
        _merge_dict_into_dataclass(yaml_cfg, out)
    return out


def cfg_from_dict(d: Dict[str, Any], base: Config = None) -> Config:
    out = copy.deepcopy(base) if base is not None else Config()
    _merge_dict_into_dataclass(d or {}, out)
    return out


# Module-level default instance for CLI convenience (the reference exposes a
# mutable singleton ``cfg``; miscc/config.py:10). Library code should accept a
# Config argument instead of importing this.
cfg = Config()
