"""Native C++ loader: build, parity with the Python reader, throughput."""

import json
import os
import time

import numpy as np
import PIL.Image
import pytest

from gagan_tpu.data import ImageFolderDataset, dataset_tool
from gagan_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def data_zip(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    rng = np.random.RandomState(0)
    labels = []
    for i in range(20):
        img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        name = f"img{i:04d}.png"
        PIL.Image.fromarray(img).save(d / name)
        labels.append([name, i % 4])
    with open(d / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    dest = str(tmp_path_factory.mktemp("zips") / "data.zip")
    dataset_tool.convert_dataset(str(d), dest)
    return dest


@pytest.fixture(scope="module")
def native_built():
    if not nl.build_native():
        pytest.skip("native loader build failed")
    return True


def test_native_matches_python_reader(data_zip, native_built):
    py_ds = ImageFolderDataset(data_zip, use_labels=True)
    nat_ds = nl.NativeZipDataset(data_zip, use_labels=True)
    assert len(py_ds) == len(nat_ds) == 20
    assert nat_ds.image_shape == py_ds.image_shape
    assert nat_ds.label_dim == py_ds.label_dim

    idxs = [0, 3, 7, 19]
    imgs, labels = nat_ds.read_batch(idxs)
    for k, i in enumerate(idxs):
        py_img, py_label = py_ds[i]
        np.testing.assert_array_equal(imgs[k], py_img)
        np.testing.assert_array_equal(labels[k], py_label)


def test_native_xflip(data_zip, native_built):
    nat = nl.NativeZipDataset(data_zip, xflip=True)
    assert len(nat) == 40
    img, _ = nat[0]
    img_f, _ = nat[20]
    np.testing.assert_array_equal(img_f, img[:, :, ::-1])


def test_native_loader_iterator(data_zip, native_built):
    nat = nl.NativeZipDataset(data_zip, use_labels=True)
    it = nl.native_data_loader(nat, batch_size=8)
    imgs, labels = next(it)
    assert imgs.shape == (8, 3, 32, 32)
    assert labels.shape == (8, 4)
    it.close()


def test_native_faster_than_python(data_zip, native_built):
    # Throughput check on repeated batch decode (not a strict benchmark, but
    # the native path should not be slower than per-image PIL decode).
    py_ds = ImageFolderDataset(data_zip)
    nat_ds = nl.NativeZipDataset(data_zip)
    idxs = list(range(20)) * 5

    t0 = time.perf_counter()
    for i in idxs:
        py_ds[i]
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    nat_ds.read_batch(idxs)
    t_nat = time.perf_counter() - t0
    # Allow generous slack for tiny images; mainly assert it works at scale.
    assert t_nat < t_py * 2.0, (t_nat, t_py)
