"""Dataset tooling tests: zip conversion roundtrip, labels, sampler, loader."""

import json
import os
import zipfile

import numpy as np
import PIL.Image
import pytest

from gagan_tpu.data import ImageFolderDataset, InfiniteSampler, data_loader
from gagan_tpu.data import dataset_tool


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    labels = []
    for i in range(12):
        img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        name = f"img{i:04d}.png"
        PIL.Image.fromarray(img).save(d / name)
        labels.append([name, i % 3])
    with open(d / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(d)


def test_convert_and_load_zip(image_dir, tmp_path):
    dest = str(tmp_path / "data.zip")
    dataset_tool.convert_dataset(image_dir, dest)
    with zipfile.ZipFile(dest) as z:
        names = z.namelist()
    assert "dataset.json" in names
    assert sum(n.endswith(".png") for n in names) == 12

    ds = ImageFolderDataset(dest, use_labels=True)
    assert len(ds) == 12
    assert ds.resolution == 16
    assert ds.num_channels == 3
    assert ds.label_dim == 3
    img, label = ds[0]
    assert img.shape == (3, 16, 16) and img.dtype == np.uint8
    assert label.shape == (3,) and label.sum() == 1


def test_dataset_dir_max_size_xflip(image_dir):
    ds = ImageFolderDataset(image_dir, max_size=8, xflip=True)
    assert len(ds) == 16
    img_a, _ = ds[0]
    img_b, _ = ds[8]   # flipped twin of raw index order
    assert img_a.shape == img_b.shape
    # xflip of the same raw index must be a mirror.
    np.testing.assert_array_equal(img_b, img_a[:, :, ::-1])


def test_center_crop_transform():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (20, 30, 3), dtype=np.uint8)
    t = dataset_tool.make_transform("center-crop", 16, 16)
    out = t(img)
    assert out.shape == (16, 16, 3)


def test_infinite_sampler_rank_partition():
    n = 10
    iters = [iter(InfiniteSampler(n, rank=r, num_replicas=2, seed=0))
             for r in range(2)]
    seen = [set() for _ in range(2)]
    for r, it in enumerate(iters):
        for _ in range(50):
            idx = next(it)
            assert 0 <= idx < n
            seen[r].add(idx)
    # Both ranks eventually see (nearly) the whole dataset.
    assert len(seen[0] | seen[1]) == n


def test_data_loader_batches(image_dir):
    ds = ImageFolderDataset(image_dir, use_labels=True)
    it = data_loader(ds, batch_size=4, num_workers=2)
    imgs, labels = next(it)
    assert imgs.shape == (4, 3, 16, 16) and imgs.dtype == np.uint8
    assert labels.shape == (4, 3)
    imgs2, _ = next(it)
    assert not np.array_equal(imgs, imgs2)
    it.close()
