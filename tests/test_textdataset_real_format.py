"""TextDataset against fabricated real-format data.

Builds tiny on-disk replicas of the CUB and COCO layouts the reference
consumes (datasets.py:219-344) — filenames/char-CNN-RNN-embeddings/
class_info pickles, CUB bounding_boxes.txt + images.txt, real JPEGs — and
asserts the exact keying/indexing semantics where silent format drift would
corrupt training invisibly:

  * bbox dict keyed by images.txt name minus '.jpg' (datasets.py:231-239),
  * CUB image path under CUB_200_2011/images/<key>.jpg (datasets.py:300),
  * 1-based class ids passed through untouched (class_info.pickle),
  * wrong-pair single re-draw when the same index comes up
    (datasets.py:319-323),
  * random caption choice among the 10 embeddings (datasets.py:331-332),
  * COCO img_id parsed from the key tail, multi-hot with 1-based category
    ids and the background slot for empty labels (datasets.py:303-344).
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from text2img_ekl_tpu.data import TextDataset
from text2img_ekl_tpu.data import transforms as T

EMB_DIM = 32  # stand-in for 1024; the loader never hard-codes the width
NUM_CAPS = 10


def _write_pickle(path, obj):
    with open(path, 'wb') as f:
        pickle.dump(obj, f, protocol=2)


def _save_jpg(path, size=(80, 70), color=(200, 30, 30)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.zeros((size[1], size[0], 3), np.uint8)
    arr[:, :] = color
    Image.fromarray(arr).save(path, quality=95)


@pytest.fixture(scope='module')
def cub_dir(tmp_path_factory):
    """A 3-image CUB layout: images.txt/bounding_boxes.txt keyed 1..3,
    train split pickles, JPEGs under CUB_200_2011/images/<cls>/<name>.jpg."""
    root = tmp_path_factory.mktemp('data') / 'birds'
    cub = root / 'CUB_200_2011'
    names = ['001.First_Class/First_0001_1', '001.First_Class/First_0002_2',
             '002.Second_Class/Second_0001_3']
    bboxes = [[10, 12, 40, 30], [5, 5, 30, 50], [0, 0, 60, 60]]
    os.makedirs(cub, exist_ok=True)
    with open(cub / 'images.txt', 'w') as f:
        for i, n in enumerate(names):
            f.write('%d %s.jpg\n' % (i + 1, n))
    with open(cub / 'bounding_boxes.txt', 'w') as f:
        for i, bb in enumerate(bboxes):
            f.write('%d %.1f %.1f %.1f %.1f\n' % (i + 1, *bb))
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
    for n, c in zip(names, colors):
        _save_jpg(str(cub / 'images' / (n + '.jpg')), color=c)

    split = root / 'train'
    os.makedirs(split, exist_ok=True)
    _write_pickle(split / 'filenames.pickle', names)
    rs = np.random.RandomState(0)
    emb = rs.randn(len(names), NUM_CAPS, EMB_DIM).astype(np.float32)
    _write_pickle(split / 'char-CNN-RNN-embeddings.pickle', emb)
    _write_pickle(split / 'class_info.pickle', [1, 1, 2])  # 1-based
    return str(root), names, bboxes, emb


def test_cub_bbox_keyed_by_filename_minus_ext(cub_dir):
    root, names, bboxes, _ = cub_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200)
    assert set(ds.bbox) == set(names)
    for n, bb in zip(names, bboxes):
        assert ds.bbox[n] == bb


def test_cub_training_pair_contract(cub_dir):
    root, names, _, emb = cub_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200, seed=3)
    item = ds.training_pair(0)
    assert [im.shape for im in item['imgs']] == [(64, 64, 3), (128, 128, 3)]
    assert [im.shape for im in item['wrong_imgs']] == [(64, 64, 3),
                                                       (128, 128, 3)]
    for im in item['imgs'] + item['wrong_imgs']:
        assert im.dtype == np.float32
        assert im.min() >= -1.0 and im.max() <= 1.0
    # the caption is one of the 10 embeddings of THIS item
    assert any(np.allclose(item['embedding'], emb[0, c])
               for c in range(NUM_CAPS))
    assert item['cls'] == 1  # 1-based id straight from class_info.pickle
    assert item['cls'].dtype == np.int64
    assert item['key'] == names[0]


def test_cub_pyramid_matches_manual_pipeline(cub_dir):
    """_get_pyramid == open -> bbox_crop -> transform -> multiscale, with
    the same rng stream (the reference composes exactly this,
    datasets.py:43-68)."""
    root, names, bboxes, _ = cub_dir
    tf = T.build_train_transform(128)
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200, transform=tf)
    got = ds._get_pyramid(names[1], np.random.default_rng(5))

    img = Image.open(os.path.join(
        root, 'CUB_200_2011/images', names[1] + '.jpg')).convert('RGB')
    img = T.bbox_crop(img, bboxes[1])
    img = tf(img, np.random.default_rng(5))
    want = T.multiscale_pyramid(img, [64, 128])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_cub_wrong_pair_single_redraw(cub_dir):
    """wrong_ix == index triggers exactly one re-draw
    (datasets.py:319-323)."""
    root, names, _, _ = cub_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200)

    class ScriptedRng:
        """Scripts only the dataset-index draws (hi == len(filenames));
        the transform's crop/flip randomness defers to a real rng."""

        def __init__(self, script, n):
            self.script = list(script)
            self.n = n
            self.real = np.random.default_rng(0)

        def integers(self, lo, hi):
            if hi == self.n and self.script:
                return self.script.pop(0)
            return int(self.real.integers(lo, hi))

        def random(self):
            return self.real.random()

    # draw index itself, then 2: the wrong image must be item 2's
    rng = ScriptedRng([0, 2], n=len(names))
    item = ds.training_pair(0, rng=rng)
    assert not rng.script, 'both scripted draws must be consumed'
    want = ds._get_pyramid(names[2], np.random.default_rng(0))
    # items are solid distinct colors: channel means identify the image
    assert item['wrong_imgs'][0].shape == want[0].shape
    np.testing.assert_allclose(item['wrong_imgs'][0].mean(axis=(0, 1)),
                               want[0].mean(axis=(0, 1)), atol=0.05)
    # ...and it is NOT item 0 (the red one)
    assert abs(item['wrong_imgs'][0].mean(axis=(0, 1))[0]
               - item['imgs'][0].mean(axis=(0, 1))[0]) > 0.5


def test_cub_test_pair_contract(cub_dir):
    root, names, _, emb = cub_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200, train_pairs=False)
    item = ds[2]
    assert item['embeddings'].shape == (NUM_CAPS, EMB_DIM)
    np.testing.assert_array_equal(item['embeddings'], emb[2])
    assert item['cls'] == 2
    assert item['key'] == names[2]


@pytest.fixture(scope='module')
def coco_dir(tmp_path_factory):
    """A 2-image COCO layout: keys carry the img_id in the tail,
    class_info.pickle is an img_id-keyed dict of 1-based category lists."""
    root = tmp_path_factory.mktemp('data2') / 'coco'
    names = ['COCO_train2014_000000000042', 'COCO_train2014_000000000011']
    for n in names:
        _save_jpg(str(root / 'train2014' / (n + '.jpg')), color=(0, 120, 240))
    split = root / 'train'
    os.makedirs(split, exist_ok=True)
    _write_pickle(split / 'filenames.pickle', names)
    rs = np.random.RandomState(1)
    emb = rs.randn(len(names), 5, EMB_DIM).astype(np.float32)
    _write_pickle(split / 'char-CNN-RNN-embeddings.pickle', emb)
    _write_pickle(split / 'class_info.pickle', {42: [3, 7], 11: []})
    return str(root), names


def test_coco_multihot_from_img_id(coco_dir):
    root, names = coco_dir
    entity = 80
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=entity)
    assert ds.is_coco
    item = ds.training_pair(0)
    cls = item['cls']
    assert cls.shape == (entity + 1,)
    # 1-based category ids -> 0-based slots (datasets.py:343-344)
    assert cls[2] == 1 and cls[6] == 1 and cls.sum() == 2
    assert cls[-1] == 0
    item2 = ds.training_pair(1)
    # empty label list -> background slot (datasets.py:340-341)
    assert item2['cls'][-1] == 1 and item2['cls'].sum() == 1


def _native_or_skip(ds):
    from text2img_ekl_tpu.data.native_loader import NativeUnavailable
    try:
        ds._native_decoder()
    except NativeUnavailable as e:
        pytest.skip('native loader unavailable: %s' % e)


def test_native_batch_items_contract(cub_dir):
    """batch_items (the C++ decode path) produces the same batch contract
    as the per-item PIL path collated by the DataLoader."""
    root, names, _, emb = cub_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200, native_decode=True, seed=11)
    _native_or_skip(ds)
    batch = ds.batch_items([0, 2], seed=5)
    assert [b.shape for b in batch['imgs']] == [(2, 64, 64, 3),
                                                (2, 128, 128, 3)]
    assert [b.shape for b in batch['wrong_imgs']] == [(2, 64, 64, 3),
                                                      (2, 128, 128, 3)]
    assert batch['embedding'].shape == (2, EMB_DIM)
    np.testing.assert_array_equal(batch['cls'], [1, 2])
    assert batch['key'] == [names[0], names[2]]
    # solid-color items: the decoded channel means identify each image
    # (item 0 red, item 2 blue) through the bbox-crop + transform pipeline
    m0 = batch['imgs'][0][0].mean(axis=(0, 1))
    m2 = batch['imgs'][0][1].mean(axis=(0, 1))
    assert m0[0] > m0[2] and m2[2] > m2[0]
    for b in batch['imgs'] + batch['wrong_imgs']:
        assert b.min() >= -1.0 and b.max() <= 1.0


def test_native_path_through_dataloader(cub_dir):
    from text2img_ekl_tpu.data import DataLoader
    root, names, _, emb = cub_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200, native_decode=True, seed=11)
    _native_or_skip(ds)
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batches = list(dl)
    assert len(batches) == 1  # 3 items, drop_last
    b = batches[0]
    assert b['imgs'][0].shape == (2, 64, 64, 3)
    assert b['key'] == [names[0], names[1]]


def test_native_test_pairs_batch(cub_dir):
    root, names, _, emb = cub_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=200, native_decode=True, train_pairs=False)
    _native_or_skip(ds)
    batch = ds.batch_items([1], seed=0)
    assert batch['imgs'][1].shape == (1, 128, 128, 3)
    assert batch['embeddings'].shape == (1, NUM_CAPS, EMB_DIM)
    np.testing.assert_array_equal(batch['embeddings'][0], emb[1])
    assert batch['cls'][0] == 1


def test_coco_image_path_under_train2014(coco_dir):
    root, names = coco_dir
    ds = TextDataset(root, 'train', base_size=64, branch_num=2,
                     entity_dim=80)
    assert ds._image_path(names[0]) == os.path.join(
        root, 'train2014', names[0] + '.jpg')
    item = ds[0]
    assert item['imgs'][0].shape == (64, 64, 3)


def test_coco_test_split_loads_from_root(coco_dir):
    """Reference prepair_test_pairs has NO coco branch — eval images load
    from the DATA_DIR root (reference datasets.py:349-360), not
    /train2014. Matching that keeps the reference's on-disk eval layout
    working verbatim."""
    root, names = coco_dir
    split = os.path.join(root, 'test')
    os.makedirs(split, exist_ok=True)
    import shutil
    for f in ('filenames.pickle', 'char-CNN-RNN-embeddings.pickle',
              'class_info.pickle'):
        shutil.copy(os.path.join(root, 'train', f), os.path.join(split, f))
    for n in names:
        shutil.copy(os.path.join(root, 'train2014', n + '.jpg'),
                    os.path.join(root, n + '.jpg'))
    ds = TextDataset(root, 'test', base_size=64, branch_num=2,
                     entity_dim=80, train_pairs=False)
    assert ds._image_path(names[0]) == os.path.join(root, names[0] + '.jpg')
    item = ds[0]
    assert item['imgs'][0].shape == (64, 64, 3)
