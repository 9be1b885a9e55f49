#!/usr/bin/env python
"""Fabricate a frozen GraphDef with the 2015 ImageNet export's exact
architecture and node names, with random weights.

The real ``classify_image_graph_def.pb`` (downloaded by the reference,
fid.py:190-206, from inception-2015-12-05.tgz) cannot be fetched in this
environment, so converter (b) (eval/convert_tf.frozen_graph_to_flax) is
proven the same way converter (a) was: synthesize a file in the REAL
format — same node names, same op semantics (legacy bilinear resize,
(x-128)*0.0078125 normalization, conv/batchnorm/relu chains, the mixed_10
max-pool quirk, 1008-way softmax whose biases the reference ignores) —
execute it with TF, and assert the converted flax tower reproduces pool_3
and the softmax within tolerance (tests/test_frozen_pb.py).

Node-name layout (verified against the import targets the reference code
dereferences: 'ExpandDims:0', 'pool_3:0', 'softmax/logits/MatMul' —
fid.py:95, inception_score_general.py:78-99 — and the conversion tables
every public port of this graph uses, e.g. the pytorch-fid project's
"FID Inception" port, which documents the mixed_10 max pool):

  stem    conv conv_1 conv_2 [pool] conv_3 conv_4 [pool_1]
  35x35   mixed mixed_1 mixed_2        (pool proj 32/64/64)
  reduce  mixed_3
  17x17   mixed_4..mixed_7             (c7 = 128/160/160/192)
  reduce  mixed_8
  8x8     mixed_9 mixed_10             (mixed_10 pool branch = MAX pool)
  head    pool_3, softmax/weights [2048,1008], softmax/biases

Each conv scope holds Consts 'conv2d_params' (HWIO) and
'batchnorm/{beta,gamma,moving_mean,moving_variance}' (eps 1e-3).
"""

from __future__ import annotations

import numpy as np


class _G:
    """Graph builder state: RNG + tf handle."""

    def __init__(self, tf, rng):
        self.tf = tf
        self.rng = rng

    def conv_bn(self, x, scope, cout, k=(3, 3), stride=1, padding='SAME'):
        tf = self.tf
        cin = int(x.shape[-1])
        fan_in = k[0] * k[1] * cin
        with tf.name_scope(scope):
            w = tf.constant(
                self.rng.normal(0, fan_in ** -0.5,
                                (k[0], k[1], cin, cout)).astype(np.float32),
                name='conv2d_params')
            x = tf.nn.conv2d(x, w, [1, stride, stride, 1], padding)
            with tf.name_scope('batchnorm'):
                beta = tf.constant(self.rng.normal(
                    0, 0.1, (cout,)).astype(np.float32), name='beta')
                gamma = tf.constant(self.rng.uniform(
                    0.8, 1.2, (cout,)).astype(np.float32), name='gamma')
                mean = tf.constant(self.rng.normal(
                    0, 0.05, (cout,)).astype(np.float32), name='moving_mean')
                var = tf.constant(self.rng.uniform(
                    0.5, 1.5, (cout,)).astype(np.float32),
                    name='moving_variance')
            x = tf.nn.batch_normalization(x, mean, var, beta, gamma, 1e-3)
            return tf.nn.relu(x)

    def avg_pool(self, x, name):
        return self.tf.nn.avg_pool2d(x, 3, 1, 'SAME', name=name)

    def max_pool(self, x, name, stride=1, padding='SAME'):
        return self.tf.nn.max_pool2d(x, 3, stride, padding, name=name)


def _mixed_35(g, x, scope, pool_proj):
    tf = g.tf
    with tf.name_scope(scope):
        b0 = g.conv_bn(x, 'conv', 64, (1, 1))
        with tf.name_scope('tower'):
            b1 = g.conv_bn(x, 'conv', 48, (1, 1))
            b1 = g.conv_bn(b1, 'conv_1', 64, (5, 5))
        with tf.name_scope('tower_1'):
            b2 = g.conv_bn(x, 'conv', 64, (1, 1))
            b2 = g.conv_bn(b2, 'conv_1', 96, (3, 3))
            b2 = g.conv_bn(b2, 'conv_2', 96, (3, 3))
        with tf.name_scope('tower_2'):
            b3 = g.avg_pool(x, 'pool')
            b3 = g.conv_bn(b3, 'conv', pool_proj, (1, 1))
        return tf.concat([b0, b1, b2, b3], 3)


def _mixed_3(g, x):
    tf = g.tf
    with tf.name_scope('mixed_3'):
        b0 = g.conv_bn(x, 'conv', 384, (3, 3), stride=2, padding='VALID')
        with tf.name_scope('tower'):
            b1 = g.conv_bn(x, 'conv', 64, (1, 1))
            b1 = g.conv_bn(b1, 'conv_1', 96, (3, 3))
            b1 = g.conv_bn(b1, 'conv_2', 96, (3, 3), stride=2,
                           padding='VALID')
        b2 = g.max_pool(x, 'pool', stride=2, padding='VALID')
        return tf.concat([b0, b1, b2], 3)


def _mixed_17(g, x, scope, c7):
    tf = g.tf
    with tf.name_scope(scope):
        b0 = g.conv_bn(x, 'conv', 192, (1, 1))
        with tf.name_scope('tower'):
            b1 = g.conv_bn(x, 'conv', c7, (1, 1))
            b1 = g.conv_bn(b1, 'conv_1', c7, (1, 7))
            b1 = g.conv_bn(b1, 'conv_2', 192, (7, 1))
        with tf.name_scope('tower_1'):
            b2 = g.conv_bn(x, 'conv', c7, (1, 1))
            b2 = g.conv_bn(b2, 'conv_1', c7, (7, 1))
            b2 = g.conv_bn(b2, 'conv_2', c7, (1, 7))
            b2 = g.conv_bn(b2, 'conv_3', c7, (7, 1))
            b2 = g.conv_bn(b2, 'conv_4', 192, (1, 7))
        with tf.name_scope('tower_2'):
            b3 = g.avg_pool(x, 'pool')
            b3 = g.conv_bn(b3, 'conv', 192, (1, 1))
        return tf.concat([b0, b1, b2, b3], 3)


def _mixed_8(g, x):
    tf = g.tf
    with tf.name_scope('mixed_8'):
        with tf.name_scope('tower'):
            b0 = g.conv_bn(x, 'conv', 192, (1, 1))
            b0 = g.conv_bn(b0, 'conv_1', 320, (3, 3), stride=2,
                           padding='VALID')
        with tf.name_scope('tower_1'):
            b1 = g.conv_bn(x, 'conv', 192, (1, 1))
            b1 = g.conv_bn(b1, 'conv_1', 192, (1, 7))
            b1 = g.conv_bn(b1, 'conv_2', 192, (7, 1))
            b1 = g.conv_bn(b1, 'conv_3', 192, (3, 3), stride=2,
                           padding='VALID')
        b2 = g.max_pool(x, 'pool', stride=2, padding='VALID')
        return tf.concat([b0, b1, b2], 3)


def _mixed_8x8(g, x, scope, pool_max):
    tf = g.tf
    with tf.name_scope(scope):
        b0 = g.conv_bn(x, 'conv', 320, (1, 1))
        with tf.name_scope('tower'):
            b1 = g.conv_bn(x, 'conv', 384, (1, 1))
            with tf.name_scope('mixed'):
                b1a = g.conv_bn(b1, 'conv', 384, (1, 3))
                b1b = g.conv_bn(b1, 'conv_1', 384, (3, 1))
            b1 = tf.concat([b1a, b1b], 3)
        with tf.name_scope('tower_1'):
            b2 = g.conv_bn(x, 'conv', 448, (1, 1))
            b2 = g.conv_bn(b2, 'conv_1', 384, (3, 3))
            with tf.name_scope('mixed'):
                b2a = g.conv_bn(b2, 'conv', 384, (1, 3))
                b2b = g.conv_bn(b2, 'conv_1', 384, (3, 1))
            b2 = tf.concat([b2a, b2b], 3)
        with tf.name_scope('tower_2'):
            # the 2015 export's quirk: mixed_10 pool branch is a MAX pool
            b3 = (g.max_pool(x, 'pool') if pool_max
                  else g.avg_pool(x, 'pool'))
            b3 = g.conv_bn(b3, 'conv', 192, (1, 1))
        return tf.concat([b0, b1, b2, b3], 3)


def build_frozen_graph(seed: int = 0, num_classes: int = 1008):
    """Build the graph; returns (tf.Graph, softmax_wonly_tensor_name)."""
    import tensorflow as tf
    tf = tf.compat.v1

    graph = tf.Graph()
    rng = np.random.default_rng(seed)
    g = _G(tf, rng)
    with graph.as_default():
        inp = tf.placeholder(tf.float32, [None, None, None, 3],
                             name='ExpandDims')
        x = tf.image.resize_bilinear(inp, [299, 299], name='ResizeBilinear')
        x = tf.subtract(x, 128.0, name='Sub')
        x = tf.multiply(x, 0.0078125, name='Mul')
        x = g.conv_bn(x, 'conv', 32, stride=2, padding='VALID')
        x = g.conv_bn(x, 'conv_1', 32, padding='VALID')
        x = g.conv_bn(x, 'conv_2', 64)
        x = g.max_pool(x, 'pool', stride=2, padding='VALID')
        x = g.conv_bn(x, 'conv_3', 80, (1, 1), padding='VALID')
        x = g.conv_bn(x, 'conv_4', 192, padding='VALID')
        x = g.max_pool(x, 'pool_1', stride=2, padding='VALID')
        x = _mixed_35(g, x, 'mixed', 32)
        x = _mixed_35(g, x, 'mixed_1', 64)
        x = _mixed_35(g, x, 'mixed_2', 64)
        x = _mixed_3(g, x)
        x = _mixed_17(g, x, 'mixed_4', 128)
        x = _mixed_17(g, x, 'mixed_5', 160)
        x = _mixed_17(g, x, 'mixed_6', 160)
        x = _mixed_17(g, x, 'mixed_7', 192)
        x = _mixed_8(g, x)
        x = _mixed_8x8(g, x, 'mixed_9', pool_max=False)
        x = _mixed_8x8(g, x, 'mixed_10', pool_max=True)
        pool3 = tf.nn.avg_pool2d(x, 8, 1, 'VALID', name='pool_3')
        with tf.name_scope('softmax'):
            w = tf.constant(rng.normal(
                0, 2048 ** -0.5, (2048, num_classes)).astype(np.float32),
                name='weights')
            tf.constant(rng.normal(0, 0.1, (num_classes,)).astype(
                np.float32), name='biases')  # present but ignored (see doc)
            with tf.name_scope('logits'):
                logits = tf.matmul(
                    tf.reshape(pool3, [-1, 2048]), w, name='MatMul')
            sm = tf.nn.softmax(logits, name='softmax_wonly')
    return graph, sm.name


def write_frozen_pb(path: str, seed: int = 0,
                    num_classes: int = 1008) -> str:
    """Serialize the fabricated graph to ``path``; returns the softmax
    tensor name for test execution."""
    import os

    import tensorflow as tf

    graph, sm_name = build_frozen_graph(seed, num_classes)
    d, name = os.path.split(path)
    tf.io.write_graph(graph.as_graph_def(), d or '.', name, as_text=False)
    return sm_name


if __name__ == '__main__':
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('out', help='output .pb path')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--num_classes', type=int, default=1008)
    a = ap.parse_args()
    print('softmax tensor:', write_frozen_pb(a.out, a.seed, a.num_classes))
    print('wrote', a.out)
