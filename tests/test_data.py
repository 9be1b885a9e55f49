"""Data layer tests: transforms, synthetic dataset, loader, batch assembly."""

import numpy as np
import pytest
from PIL import Image

from text2img_ekl_tpu.data import (
    DataLoader, SyntheticTextDataset, bbox_crop, build_train_transform,
    multiscale_pyramid)
from text2img_ekl_tpu.data.transforms import (
    build_eval_transform, normalize_to_pm1, scale_shorter_side)


def _img(w=120, h=90):
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_bbox_crop_square_around_center():
    """0.75 * max-side square around the bbox center (datasets.py:47-55)."""
    img = _img(200, 200)
    bbox = [50, 60, 40, 80]  # x, y, w, h
    out = bbox_crop(img, bbox)
    r = int(80 * 0.75)  # 60
    cx, cy = int((2 * 50 + 40) / 2), int((2 * 60 + 80) / 2)  # 70, 100
    assert out.size == (min(200, cx + r) - max(0, cx - r),
                        min(200, cy + r) - max(0, cy - r))


def test_bbox_crop_clamps_to_image():
    img = _img(100, 100)
    out = bbox_crop(img, [0, 0, 100, 100])
    assert out.size[0] <= 100 and out.size[1] <= 100


def test_scale_shorter_side():
    img = _img(120, 90)
    out = scale_shorter_side(img, 45)
    assert out.size == (60, 45)


def test_train_transform_output_size():
    t = build_train_transform(64)
    rng = np.random.default_rng(0)
    out = t(_img(300, 200), rng)
    assert out.size == (64, 64)


def test_eval_transform_deterministic():
    t = build_eval_transform(64)
    a = np.asarray(t(_img(300, 200)))
    b = np.asarray(t(_img(300, 200)))
    np.testing.assert_array_equal(a, b)


def test_normalize_range():
    arr = normalize_to_pm1(_img(8, 8))
    assert arr.dtype == np.float32
    assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_pyramid_sizes():
    img = _img(128, 128)
    pyr = multiscale_pyramid(img, [32, 64, 128])
    assert [p.shape[0] for p in pyr] == [32, 64, 128]


def test_synthetic_training_pair_contract():
    ds = SyntheticTextDataset(num_items=16, base_size=32, branch_num=2,
                              entity_dim=10, text_dim=64)
    item = ds[0]
    assert len(item['imgs']) == 2
    assert item['imgs'][0].shape == (32, 32, 3)
    assert item['imgs'][1].shape == (64, 64, 3)
    assert item['embedding'].shape == (64,)
    assert 1 <= int(item['cls']) <= 10
    assert len(item['wrong_imgs']) == 2


def test_synthetic_test_pair_contract():
    ds = SyntheticTextDataset(num_items=8, base_size=32, branch_num=2,
                              entity_dim=10, text_dim=64, train_pairs=False)
    item = ds[3]
    assert item['embeddings'].shape == (10, 64)


def test_synthetic_coco_multihot():
    ds = SyntheticTextDataset(num_items=8, base_size=32, branch_num=2,
                              entity_dim=10, is_coco=True)
    item = ds[0]
    assert item['cls'].shape == (11,)
    assert item['cls'].sum() >= 1


def test_loader_batching_and_drop_last():
    ds = SyntheticTextDataset(num_items=10, base_size=32, branch_num=2,
                              entity_dim=5, text_dim=16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b['imgs'][0].shape == (4, 32, 32, 3)
    assert b['embedding'].shape == (4, 16)
    assert b['cls'].shape == (4,)
    assert len(b['key']) == 4


def test_loader_reshuffles_between_epochs():
    ds = SyntheticTextDataset(num_items=64, base_size=32, branch_num=2,
                              entity_dim=50, text_dim=8)
    dl = DataLoader(ds, batch_size=32, shuffle=True, num_workers=1)
    e1 = [tuple(b['cls'].tolist()) for b in dl]
    e2 = [tuple(b['cls'].tolist()) for b in dl]
    assert e1 != e2


def test_loader_process_sharding_partitions_epoch():
    """Multi-host striding: every process shuffles with the same epoch
    seed and takes a disjoint stride truncated to the minimum shard size
    (so every process sees identical batch counts AND shapes); the union
    covers the epoch up to the < num_shards leftover items that no
    lockstep schedule could consume."""
    ds = SyntheticTextDataset(num_items=67, base_size=32, branch_num=1,
                              entity_dim=5, text_dim=4)
    shards = [DataLoader(ds, batch_size=4, shuffle=True, num_workers=1,
                         seed=7, shard_id=i, num_shards=4)
              for i in range(4)]
    per_shard = [dl._epoch_indices() for dl in shards]
    allidx = np.concatenate(per_shard)
    assert len(set(allidx.tolist())) == len(allidx)  # disjoint
    # every shard truncated to the same minimum length (67 // 4 = 16)
    assert all(len(s) == 16 for s in per_shard)
    assert len(allidx) == 64  # epoch minus the 3 unschedulable leftovers
    # same permutation across processes: shard 0 of a re-built loader
    # reproduces shard 0 exactly
    again = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1,
                       seed=7, shard_id=0, num_shards=4)
    np.testing.assert_array_equal(per_shard[0], again._epoch_indices())
    # len() reflects the shard (67 items -> 17/4-per-shard -> 4 batches)
    assert all(len(dl) == 4 for dl in shards)
    for dl in shards:
        assert len(list(dl)) == 4
    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=4, shard_id=4, num_shards=4)


def test_loader_sharded_drop_last_false_shapes_match():
    """With drop_last=False and len(dataset) % num_shards != 0, every
    process must still see IDENTICAL batch sizes (including the ragged
    final batch) or the collective step wedges on mismatched shapes."""
    ds = SyntheticTextDataset(num_items=67, base_size=32, branch_num=1,
                              entity_dim=5, text_dim=4)
    shards = [DataLoader(ds, batch_size=5, shuffle=True, num_workers=1,
                         drop_last=False, seed=3, shard_id=i, num_shards=4)
              for i in range(4)]
    sizes = [[len(b['key']) for b in dl] for dl in shards]
    assert sizes[0] == [5, 5, 5, 1]  # 16-item shard, ragged tail
    assert all(s == sizes[0] for s in sizes[1:])


def test_imagefolder_dataset(tmp_path):
    """Class-per-folder dataset with wnid filtering (reference
    datasets.py:71-133 + main.py's custom_classes lists): classes sorted,
    non-selected folders skipped, items yield a pyramid + class index."""
    from text2img_ekl_tpu.data.datasets import ImageFolderDataset
    rng = np.random.default_rng(3)
    for wnid, n in [('n02084071', 2), ('n02121620', 2), ('n99999999', 1)]:
        d = tmp_path / 'train' / wnid
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (80, 100, 3),
                                         dtype=np.uint8)).save(
                d / f'{wnid}_{i}.jpg')
    ds = ImageFolderDataset(str(tmp_path), 'train',
                            custom_classes=['n02084071', 'n02121620'],
                            base_size=16, branch_num=2)
    assert len(ds) == 4  # the unselected wnid folder is excluded
    item = ds[0]
    assert [im.shape for im in item['imgs']] == [(16, 16, 3), (32, 32, 3)]
    assert item['cls'] in (0, 1)
    for im in item['imgs']:
        assert im.min() >= -1.0 and im.max() <= 1.0
