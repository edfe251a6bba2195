"""Data-layer tests: hdf5 loading, scale modes, shuffling, augmentations."""

import h5py
import numpy as np
import pytest

from pdgn_tpu.data import (
    ShapeNetCore,
    SyntheticShapes,
    batch_iterator,
    normalize_cloud,
)
from pdgn_tpu.data import provider


@pytest.fixture(scope="module")
def tiny_hdf5(tmp_path_factory):
    """A miniature shapenet15k-layout file: 2 categories, 3 splits."""
    path = tmp_path_factory.mktemp("data") / "shapenet.hdf5"
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        for synsetid, n in (("03001627", 10), ("02691156", 6)):  # chair, airplane
            grp = f.create_group(synsetid)
            for split, k in (("train", n), ("val", 2), ("test", 4)):
                grp.create_dataset(split, data=rng.randn(k, 2048, 3).astype(np.float32))
    return str(path)


def test_shapenet_loads_and_shuffles_deterministically(tiny_hdf5):
    d1 = ShapeNetCore(tiny_hdf5, "chair", "train", "shape_unit")
    d2 = ShapeNetCore(tiny_hdf5, "chair", "train", "shape_unit")
    assert len(d1) == 10
    # deterministic random.Random(2020) shuffle -> same order
    np.testing.assert_array_equal(d1.full_clouds(), d2.full_clouds())


def test_shapenet_item_protocol(tiny_hdf5):
    d = ShapeNetCore(tiny_hdf5, "chair", "test", "shape_bbox")
    p1, p2, p3, p4, cate = d[0]
    assert p1.shape == (256, 3) and p2.shape == (512, 3)
    assert p3.shape == (1024, 3) and p4.shape == (2048, 3)
    assert cate == "chair"
    # shape_bbox: max-extent axis spans exactly [-1, 1]
    half_extent = (p4.max(0) - p4.min(0)).max() / 2
    np.testing.assert_allclose(half_extent, 1.0, rtol=1e-5)


def test_shapenet_shape_unit_stats(tiny_hdf5):
    d = ShapeNetCore(tiny_hdf5, "airplane", "train", "shape_unit")
    pc = d.items[0].pointcloud
    np.testing.assert_allclose(pc.mean(0), 0.0, atol=1e-5)
    # the scale is the flat std about the flat mean (reference semantics),
    # so the re-measured std of the centred cloud is only ~1
    np.testing.assert_allclose(pc.flatten().std(), 1.0, rtol=5e-3)


def test_shapenet_stats_cached(tiny_hdf5):
    import os

    d = ShapeNetCore(tiny_hdf5, "chair", "train", "global_unit")
    stats_dir = os.path.join(os.path.dirname(tiny_hdf5), "shapenet_stats")
    assert os.path.isdir(stats_dir) and len(os.listdir(stats_dir)) >= 1
    assert d.stats["std"] > 0


def test_normalize_cloud_modes(rng):
    pc = rng.randn(100, 3).astype(np.float32) * 3 + 1
    half = normalize_cloud(pc, "shape_half")
    want = (pc - pc.mean(0)) / (pc.flatten().std(ddof=1) / 0.5)  # torch .std()
    np.testing.assert_allclose(half, want, atol=1e-6)
    s34 = normalize_cloud(pc, "shape_34")
    want34 = (pc - pc.mean(0)) / (pc.flatten().std(ddof=1) / 0.75)
    np.testing.assert_allclose(s34, want34, atol=1e-6)
    ident = normalize_cloud(pc, None)
    np.testing.assert_allclose(ident, pc)


def test_batch_iterator_drop_last(tiny_hdf5):
    d = ShapeNetCore(tiny_hdf5, "chair", "train", "shape_unit")
    batches = list(batch_iterator(d, batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 2  # 10 // 4, trailing 2 dropped
    p1, p2, p3, p4, cates = batches[0]
    assert p1.shape == (4, 256, 3) and p4.shape == (4, 2048, 3)
    assert len(cates) == 4


def test_synthetic_dataset_protocol():
    d = SyntheticShapes(size=5, num_points=2048)
    p1, p2, p3, p4, cate = d[3]
    assert p4.shape == (2048, 3)
    # deterministic per index
    np.testing.assert_array_equal(d[3][3], SyntheticShapes(size=5)[3][3])


# ------------------------------------------------------------- augmentations
def test_rotate_preserves_norms(rng):
    x = rng.randn(4, 50, 3).astype(np.float32)
    r = np.random.RandomState(0)
    y = provider.rotate_point_cloud(x, rng=r)
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), atol=1e-4
    )
    z = provider.rotate_perturbation_point_cloud(x, rng=np.random.RandomState(1))
    np.testing.assert_allclose(
        np.linalg.norm(z, axis=-1), np.linalg.norm(x, axis=-1), atol=1e-4
    )


def test_jitter_bounded(rng):
    x = np.zeros((2, 30, 3), np.float32)
    y = provider.jitter_point_cloud(x, sigma=0.01, clip=0.05,
                                    rng=np.random.RandomState(0))
    assert np.abs(y).max() <= 0.05


def test_scale_and_shift(rng):
    x = np.ones((3, 10, 3), np.float32)
    y = provider.random_scale_point_cloud(x, rng=np.random.RandomState(0))
    scales = y[:, 0, 0]
    assert np.all(scales >= 0.8) and np.all(scales <= 1.25)
    z = provider.shift_point_cloud(x, shift_range=0.1,
                                   rng=np.random.RandomState(0))
    assert np.abs(z - 1).max() <= 0.1


def test_point_dropout_replaces_with_first(rng):
    x = rng.randn(2, 100, 3).astype(np.float32)
    y = provider.random_point_dropout(x, rng=np.random.RandomState(4))
    # every dropped point equals point 0 of its cloud
    for b in range(2):
        changed = np.where(np.any(y[b] != x[b], axis=-1))[0]
        for i in changed:
            np.testing.assert_array_equal(y[b, i], x[b, 0])


def test_shuffle_points_common_permutation(rng):
    x = rng.randn(2, 20, 3).astype(np.float32)
    y = provider.shuffle_points(x.copy(), rng=np.random.RandomState(0))
    # same permutation across the batch: sorted sets match per cloud
    np.testing.assert_allclose(np.sort(y[0], 0), np.sort(x[0], 0))
    np.testing.assert_allclose(np.sort(y[1], 0), np.sort(x[1], 0))


def test_shapenet_multi_category_and_all(tiny_hdf5):
    d = ShapeNetCore(tiny_hdf5, ["chair", "airplane"], "train", "shape_unit")
    assert len(d) == 16
    cates = {d[i][4] for i in range(len(d))}
    assert cates == {"chair", "airplane"}
    # 'all' resolves to every category present in the file... categories
    # missing from the file raise KeyError on load, so restrict via list
    d2 = ShapeNetCore(tiny_hdf5, ["airplane"], "val", "shape_bbox")
    assert len(d2) == 2


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    """Miniature modelnet40_normal_resampled layout."""
    root = tmp_path_factory.mktemp("mn")
    d = root / "modelnet40_normal_resampled"
    d.mkdir()
    rng = np.random.RandomState(0)
    names = ["chair", "table"]
    (d / "modelnet10_shape_names.txt").write_text("\n".join(names) + "\n")
    (d / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    ids = []
    for name in names:
        (d / name).mkdir()
        for i in range(2):
            sid = f"{name}_{i:04d}"
            ids.append(sid)
            pts = rng.randn(2100, 6).astype(np.float32)
            np.savetxt(d / name / f"{sid}.txt", pts, delimiter=",")
    (d / "modelnet10_train.txt").write_text("\n".join(ids) + "\n")
    (d / "modelnet10_test.txt").write_text("\n".join(ids[:2]) + "\n")
    (d / "modelnet40_train.txt").write_text("\n".join(ids) + "\n")
    (d / "modelnet40_test.txt").write_text("\n".join(ids[:2]) + "\n")
    return str(root) + "/"


def test_modelnet_loader(modelnet_root):
    from pdgn_tpu.data import ModelNetDataset

    d = ModelNetDataset(root=modelnet_root, split="train", normalize=True,
                        normal_channel=False, modelnet10=True)
    assert len(d) == 4
    p1, p2, p3, p4, cls = d[0]
    assert p1.shape == (256, 3) and p4.shape == (2048, 3)
    # unit-sphere normalisation per slice
    assert abs(np.linalg.norm(p4, axis=1).max() - 1.0) < 1e-5
    assert cls.shape == (1,)
    # class filter
    d2 = ModelNetDataset(root=modelnet_root, split="train",
                         modelnet10=True, class_choice="chair")
    assert len(d2) == 2


def test_modelnet_batch_iterator(modelnet_root):
    """reset/has_next_batch/next_batch surface (reference
    datasets_4point.py:217-240)."""
    from pdgn_tpu.data import ModelNetDataset

    d = ModelNetDataset(root=modelnet_root, split="train", modelnet10=True,
                        batch_size=3, shuffle=False)
    assert d.num_channel() == 3
    assert d.num_batches == 2 and d.has_next_batch()
    b0, l0 = d.next_batch()
    assert b0.shape == (3, 2048, 3) and l0.shape == (3,)
    assert l0.dtype == np.int32
    b1, l1 = d.next_batch()
    assert b1.shape == (1, 2048, 3)  # ragged final batch
    assert not d.has_next_batch()
    # unshuffled order matches __getitem__ order
    np.testing.assert_allclose(b0[0], d[0][3])
    d.reset()
    assert d.batch_idx == 0 and d.has_next_batch()

    # augmented batch: same shape, rigid-rotation + jitter keeps radii
    # bounded; point order is shuffled
    rng = np.random.RandomState(7)
    da = ModelNetDataset(root=modelnet_root, split="train", modelnet10=True,
                         batch_size=4, shuffle=True, rng=rng)
    ba, la = da.next_batch(augment=True)
    assert ba.shape == (4, 2048, 3) and np.isfinite(ba).all()
    # scale in [0.8,1.25], shift 0.1, jitter clip 0.05: radius stays < 2
    assert np.linalg.norm(ba, axis=-1).max() < 2.0

    # normal_channel=True augments xyz but rotates normals too
    dn = ModelNetDataset(root=modelnet_root, split="train", modelnet10=True,
                         batch_size=2, shuffle=False, normal_channel=True,
                         normalize=False, rng=np.random.RandomState(3))
    bn, _ = dn.next_batch(augment=True)
    assert bn.shape == (2, 2048, 6) and np.isfinite(bn).all()


@pytest.fixture(scope="module")
def partdata_root(tmp_path_factory):
    """Miniature shapenet-part (.pts/.seg) layout."""
    root = tmp_path_factory.mktemp("part")
    rng = np.random.RandomState(0)
    (root / "synsetoffset2category.txt").write_text(
        "Chair\t03001627\nTable\t04379243\n")
    for synset in ("03001627", "04379243"):
        (root / synset / "points").mkdir(parents=True)
        (root / synset / "points_label").mkdir(parents=True)
        for i in range(3):
            n = 2500 if i == 0 else 500  # test both replace branches
            np.savetxt(root / synset / "points" / f"{i}.pts",
                       rng.randn(n, 3).astype(np.float32))
            np.savetxt(root / synset / "points_label" / f"{i}.seg",
                       rng.randint(1, 5, n))
    return str(root)


def test_partdataset_loader(partdata_root):
    from pdgn_tpu.data import PartDataset

    d = PartDataset(root=partdata_root, batch_size=2, train=True)
    # 90% of 3 files per category -> 2 each
    assert len(d) == 4
    p1, p2, p3, p4, seg = d[0]
    assert p1.shape == (256, 3) and p4.shape == (2048, 3)
    assert seg.shape == (1024,)
    assert d.num_seg_classes >= 1

    dc = PartDataset(root=partdata_root, batch_size=2, train=False,
                     classification=True)
    assert len(dc) == 2
    *_, cls = dc[0]
    assert cls.shape == (1,)
