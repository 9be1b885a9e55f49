"""uint8 input pipeline (cfg.TPU_UINT8_INPUT): raw uint8 pyramids ship
host->device at 1/4 the bytes; the fused step normalizes on-device with
x/127.5-1, which is bit-identical to the host pipeline's
ToTensor + Normalize(0.5,0.5) (reference datasets.py:190-192) because
2/255 == 1/127.5 exactly."""

import os

import numpy as np
import pytest
from PIL import Image

from text2img_ekl_tpu.data import transforms as T
from text2img_ekl_tpu.data.datasets import SyntheticTextDataset

REF_CFG_DIR = '/root/reference/cfg'


def _pil_image(seed=0, w=90, h=70):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_pyramid_uint8_matches_f32():
    img = _pil_image()
    f32 = T.multiscale_pyramid(img, [64, 128])
    u8 = T.multiscale_pyramid(img, [64, 128], as_uint8=True)
    for a, b in zip(f32, u8):
        assert b.dtype == np.uint8 and a.dtype == np.float32
        np.testing.assert_allclose(
            a, b.astype(np.float32) / 127.5 - 1.0, atol=1e-6)


def test_synthetic_dataset_uint8_contract():
    ds = SyntheticTextDataset(num_items=4, base_size=32, branch_num=2,
                              entity_dim=5, text_dim=8, uint8_output=True)
    item = ds[0]
    for im in item['imgs'] + item['wrong_imgs']:
        assert im.dtype == np.uint8
    ds_f = SyntheticTextDataset(num_items=4, base_size=32, branch_num=2,
                                entity_dim=5, text_dim=8)
    ref = ds_f[0]['imgs'][0]
    got = item['imgs'][0].astype(np.float32) / 127.5 - 1.0
    # quantization (truncating astype) is the only difference: within
    # one full 8-bit step of the [-1,1] range
    np.testing.assert_allclose(got, ref, atol=2.01 / 255.0)


def test_step_uint8_batch_matches_f32_batch():
    """The fused step on a uint8 batch computes the same losses as on
    the equivalent pre-normalized f32 batch."""
    import jax
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import (build_discriminators,
                                         build_generator)
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (cond_code_width,
                                             make_synthetic_batch)

    cfg = cfg_from_file(os.path.join(
        REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml'))
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_UINT8_INPUT = True

    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    # the step donates its state arg — keep a host copy to rebuild from
    host_state = jax.tree.map(
        np.asarray, create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                       cond_code_width(cfg)))
    step = make_train_step(cfg, G, Ds, mesh)

    b_u8 = make_synthetic_batch(cfg, 16)  # 8 virtual devices x 2
    assert b_u8['real'][0].dtype == np.uint8  # knob respected
    b_f32 = dict(b_u8)
    b_f32['real'] = tuple(
        np.asarray(x, np.float32) / 127.5 - 1.0 for x in b_u8['real'])
    b_f32['wrong'] = tuple(
        np.asarray(x, np.float32) / 127.5 - 1.0 for x in b_u8['wrong'])

    rng = np.array([9, 9], np.uint32)
    _, m8, _ = step(jax.tree.map(np.copy, host_state),
                    shard_batch(mesh, b_u8), rng)
    _, m32, _ = step(jax.tree.map(np.copy, host_state),
                     shard_batch(mesh, b_f32), rng)
    for k in m8:
        # not bit-identical: XLA lowers /127.5 to *(1/127.5) (one ulp on
        # the inputs), which the network amplifies to ~1e-4 in losses
        np.testing.assert_allclose(float(m8[k]), float(m32[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)


@pytest.mark.skipif(
    not os.path.exists('/root/repo/native/dataloader.cpp'),
    reason='native source missing')
def test_native_decoder_uint8_parity(tmp_path):
    """C++ decoder's uint8 mode returns exactly the pixels its f32 mode
    normalizes (same decode/crop/flip stream per seed)."""
    try:
        from text2img_ekl_tpu.data.native_loader import NativeDecoder
        NativeDecoder([32, 64])
    except Exception:
        pytest.skip('native loader unavailable')
    rng = np.random.default_rng(1)
    p = str(tmp_path / 'img.jpg')
    Image.fromarray(rng.integers(0, 256, (80, 100, 3),
                                 dtype=np.uint8)).save(p, quality=92)
    paths = [p, p, p]
    f = NativeDecoder([32, 64]).decode_batch(paths, train=True, seed=5)
    u = NativeDecoder([32, 64], uint8_output=True).decode_batch(
        paths, train=True, seed=5)
    for a, b in zip(f, u):
        assert b.dtype == np.uint8
        np.testing.assert_allclose(
            a, b.astype(np.float32) * np.float32(2.0 / 255.0) - 1.0,
            atol=1e-6)


def test_gspmd_uint8_defaults_smoke():
    """The gspmd fallback runs the SHIPPED numerics path (uint8 input +
    bf16 BN defaults) on the 8-device mesh and loosely tracks the
    single-device step — catches sharding-propagation regressions in
    the uint8 entry normalize that the f32-pinned tight-tolerance
    equivalence test cannot see."""
    import jax
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import (build_discriminators,
                                         build_generator)
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (cond_code_width,
                                             make_synthetic_batch)

    cfg = cfg_from_file(os.path.join(
        REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml'))
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_SPMD_MODE = 'gspmd'
    # deliberately NOT pinning TPU_UINT8_INPUT / TPU_BN_DTYPE /
    # TPU_COMPUTE_DTYPE: this is the shipped default config
    mesh = make_mesh()
    if mesh.devices.size < 8:
        pytest.skip('needs the 8-device virtual mesh')
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    batch = make_synthetic_batch(cfg, 16)
    assert batch['real'][0].dtype == np.uint8

    s_g = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                             cond_code_width(cfg))
    s_1 = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                             cond_code_width(cfg))
    rng = np.array([5, 5], np.uint32)
    _, mg, fg = make_train_step(cfg, G, Ds, mesh)(
        s_g, shard_batch(mesh, batch), rng)
    _, m1, f1 = make_train_step(cfg, G, Ds, None)(s_1, batch, rng)
    for k in mg:
        a, b = float(mg[k]), float(m1[k])
        assert np.isfinite(a) and np.isfinite(b), k
        # bf16 rounding differs across program partitions; same ballpark
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2, err_msg=k)
    np.testing.assert_allclose(np.asarray(fg, np.float32),
                               np.asarray(f1, np.float32), atol=0.25)


@pytest.mark.skipif(
    not os.path.exists('/root/repo/native/dataloader.cpp'),
    reason='native source missing')
def test_native_decoder_failure_fill_parity(tmp_path):
    """Failed decodes fill as mid-gray in BOTH output modes (f32 0.0,
    uint8 128 -> ~0.004 after the on-device normalize)."""
    try:
        from text2img_ekl_tpu.data.native_loader import NativeDecoder
        NativeDecoder([32])
    except Exception:
        pytest.skip('native loader unavailable')
    missing = [str(tmp_path / 'nope.jpg')]
    f = NativeDecoder([32]).decode_batch(missing, train=False, seed=0)
    u = NativeDecoder([32], uint8_output=True).decode_batch(
        missing, train=False, seed=0)
    np.testing.assert_array_equal(f[0], 0.0)
    np.testing.assert_array_equal(u[0], 128)
