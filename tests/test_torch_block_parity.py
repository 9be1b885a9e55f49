"""Cross-framework forward parity: torch reference blocks vs our NHWC flax
blocks with transplanted weights.

The reference trains with torch Conv2d/BatchNorm2d/GLU chains
(reference model.py:68-123, 811-850); GAN convergence is sensitive to
these exact semantics (SURVEY.md section 7, "hard parts" 3). These tests
build the torch chain, copy its weights into our modules (OIHW -> HWIO),
and assert the forward outputs match at f32.

Known, measured semantic delta (asserted exactly below): torch updates
running_var with the UNBIASED batch variance (n/(n-1) correction) while
flax nn.BatchNorm uses the biased one. Both normalize the batch with the
biased variance, so train-mode outputs are identical; only the running
average drifts by (1-momentum)*var/(n-1) per step — ~0.6e-4 relative at
the reference's smallest real population (bs24 at 4x4 spatial) and
O(1e-6) at 64px feature maps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from text2img_ekl_tpu.nn import blocks


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _nchw(x):
    return _t(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _from_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _conv_w(torch_conv):
    # torch OIHW -> flax HWIO
    return jnp.asarray(
        torch_conv.weight.detach().numpy().transpose(2, 3, 1, 0))


def test_conv3x3_matches_torch():
    x = np.random.default_rng(0).normal(size=(2, 9, 9, 5)).astype(np.float32)
    tc = torch.nn.Conv2d(5, 7, 3, stride=1, padding=1, bias=False)
    ref = _from_nchw(tc(_nchw(x)))

    m = blocks.Conv3x3(7, dtype=jnp.float32)
    vs = {'params': {'Conv_0': {'kernel': _conv_w(tc)}}}
    out = np.asarray(m.apply(vs, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_conv4x4s2_matches_torch():
    x = np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(
        np.float32)
    tc = torch.nn.Conv2d(3, 8, 4, stride=2, padding=1, bias=False)
    ref = _from_nchw(tc(_nchw(x)))

    m = blocks.Conv4x4s2(8, dtype=jnp.float32)
    vs = {'params': {'Conv_0': {'kernel': _conv_w(tc)}}}
    out = np.asarray(m.apply(vs, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_glu_matches_torch():
    x = np.random.default_rng(2).normal(size=(2, 4, 4, 6)).astype(np.float32)
    # torch GLU splits the channel dim: NCHW dim=1 == our trailing axis
    ref = _from_nchw(torch.nn.GLU(dim=1)(_nchw(x)))
    out = np.asarray(blocks.glu(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def _bn_pair(c):
    """(torch BatchNorm2d, our BatchNorm variables) with matched params."""
    tb = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tb.weight.copy_(torch.linspace(0.8, 1.2, c))
        tb.bias.copy_(torch.linspace(-0.1, 0.1, c))
        tb.running_mean.copy_(torch.linspace(-0.5, 0.5, c))
        tb.running_var.copy_(torch.linspace(0.7, 1.4, c))
    # np.array COPIES: tensor.numpy() shares memory with the tensor, and
    # jnp.asarray can be zero-copy on CPU — torch's in-place running-stat
    # update during its forward would otherwise mutate what flax reads.
    vs = {'params': {'BatchNorm_0': {
              'scale': jnp.asarray(np.array(tb.weight.detach().numpy())),
              'bias': jnp.asarray(np.array(tb.bias.detach().numpy()))}},
          'batch_stats': {'BatchNorm_0': {
              'mean': jnp.asarray(np.array(tb.running_mean.numpy())),
              'var': jnp.asarray(np.array(tb.running_var.numpy()))}}}
    return tb, vs


def test_batchnorm_train_forward_and_running_stats_match_torch():
    c = 6
    x = np.random.default_rng(3).normal(size=(4, 8, 8, c)).astype(np.float32)
    tb, vs = _bn_pair(c)

    tb.train()
    ref = _from_nchw(tb(_nchw(x)))
    m = blocks.BatchNorm(dtype=jnp.float32)
    out, mut = m.apply(vs, jnp.asarray(x), mutable=['batch_stats'])
    # train-mode normalization (biased batch variance): identical
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    # running mean updates identically; running var differs by EXACTLY the
    # unbiased correction torch applies to the update contribution
    # (n/(n-1) with n = B*H*W) — the one documented BN semantic delta.
    n = x.shape[0] * x.shape[1] * x.shape[2]
    new = mut['batch_stats']['BatchNorm_0']
    np.testing.assert_allclose(np.asarray(new['mean']),
                               tb.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    batch_var = np.var(x.reshape(-1, c), axis=0)  # biased
    ours = np.asarray(new['var'])
    theirs = tb.running_var.numpy()
    np.testing.assert_allclose(theirs - ours, 0.1 * batch_var / (n - 1),
                               rtol=1e-3, atol=1e-6)


def test_batchnorm_eval_matches_torch():
    c = 6
    x = np.random.default_rng(4).normal(size=(2, 5, 5, c)).astype(np.float32)
    tb, vs = _bn_pair(c)
    tb.eval()
    ref = _from_nchw(tb(_nchw(x)))
    m = blocks.BatchNorm(use_running_average=True, dtype=jnp.float32)
    out = np.asarray(m.apply(vs, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_upblock_matches_torch_chain():
    """upBlock (reference model.py:87-94): nearest-2x -> conv3x3(2F) ->
    BN -> GLU, torch vs ours with transplanted weights (train mode)."""
    C, F = 5, 4
    x = np.random.default_rng(5).normal(size=(2, 6, 6, C)).astype(np.float32)
    tc = torch.nn.Conv2d(C, F * 2, 3, 1, 1, bias=False)
    tb = torch.nn.BatchNorm2d(F * 2, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tb.weight.copy_(torch.linspace(0.9, 1.1, F * 2))
        tb.bias.copy_(torch.linspace(-0.05, 0.05, F * 2))
    tb.train()
    up = torch.nn.Upsample(scale_factor=2, mode='nearest')
    ref = _from_nchw(torch.nn.GLU(dim=1)(tb(tc(up(_nchw(x))))))

    m = blocks.UpBlock(F, dtype=jnp.float32)
    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        vs = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        # the BN wrapper nests an inner nn.BatchNorm: BatchNorm_0/BatchNorm_0
        vs = {
            'params': {
                'Conv3x3_0': {'Conv_0': {'kernel': _conv_w(tc)}},
                'BatchNorm_0': {'BatchNorm_0': {
                    'scale': jnp.asarray(tb.weight.detach().numpy()),
                    'bias': jnp.asarray(tb.bias.detach().numpy())}}},
            'batch_stats': vs['batch_stats']}
        out, _ = m.apply(vs, jnp.asarray(x), train=True,
                         mutable=['batch_stats'])
    finally:
        blocks.BN_DTYPE = old
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_orthogonal_init_matches_torch_semantics():
    """The reference initializes conv/linear weights with
    torch.nn.init.orthogonal_ (trainer.py:63-73), which orthonormalizes
    the rows of the (O, I*kh*kw) matricization. Our orthogonal_init
    (column_axis=-1 on the (kh,kw,I,O) kernel) orthonormalizes the
    columns of the (kh*kw*I, O) flattening — the same property on the
    same matricization, transposed."""
    from text2img_ekl_tpu.nn.blocks import orthogonal_init
    k = orthogonal_init(jax.random.PRNGKey(0), (3, 3, 16, 8), jnp.float32)
    M = np.asarray(k).reshape(-1, 8)
    np.testing.assert_allclose(M.T @ M, np.eye(8), atol=1e-5)
    w = torch.empty(8, 16, 3, 3)
    torch.nn.init.orthogonal_(w)
    W = w.numpy().reshape(8, -1)
    np.testing.assert_allclose(W @ W.T, np.eye(8), atol=1e-5)


def test_downblock_matches_torch_chain():
    """downBlock (reference model.py:822-828): conv4x4s2 -> BN ->
    LeakyReLU(0.2)."""
    C, F = 3, 8
    x = np.random.default_rng(6).normal(size=(2, 16, 16, C)).astype(
        np.float32)
    tc = torch.nn.Conv2d(C, F, 4, 2, 1, bias=False)
    tb = torch.nn.BatchNorm2d(F, eps=1e-5, momentum=0.1)
    tb.train()
    ref = _from_nchw(torch.nn.LeakyReLU(0.2)(tb(tc(_nchw(x)))))

    m = blocks.DownBlock(F, dtype=jnp.float32)
    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        vs = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        vs = {
            'params': {
                'Conv4x4s2_0': {'Conv_0': {'kernel': _conv_w(tc)}},
                'BatchNorm_0': {'BatchNorm_0': {
                    'scale': jnp.asarray(tb.weight.detach().numpy()),
                    'bias': jnp.asarray(tb.bias.detach().numpy())}}},
            'batch_stats': vs['batch_stats']}
        out, _ = m.apply(vs, jnp.asarray(x), train=True,
                         mutable=['batch_stats'])
    finally:
        blocks.BN_DTYPE = old
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
