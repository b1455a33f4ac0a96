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


# ----------------------------------------------------------------------------
# Pure-Python LMDB reader (gagan_tpu.data.lmdb_reader): synthetic
# environments built to the LMDB 0.9 on-disk struct layout (mdb.c).


def _lmdb_meta_page(psize, txnid, root, entries, depth):
    import struct

    pg = bytearray(psize)
    struct.pack_into("<H", pg, 10, 0x08)                 # P_META
    struct.pack_into("<II", pg, 16, 0xBEEFC0DE, 1)       # magic, version
    struct.pack_into("<I", pg, 40, psize)                # dbs[0].pad = psize
    struct.pack_into("<H", pg, 94, depth)                # main.depth
    struct.pack_into("<Q", pg, 120, entries)             # main.entries
    struct.pack_into("<Q", pg, 128, root)                # main.root
    struct.pack_into("<Q", pg, 144, txnid)
    return pg


def _lmdb_leaf_page(psize, pgno, items):
    """items: list of (key, value) or (key, ('big', dsize, ovf_pgno))."""
    import struct

    pg = bytearray(psize)
    struct.pack_into("<Q", pg, 0, pgno)
    struct.pack_into("<H", pg, 10, 0x02)                 # P_LEAF
    nk = len(items)
    struct.pack_into("<H", pg, 12, 16 + 2 * nk)          # lower
    pos = 16 + 2 * nk
    for i, (key, value) in enumerate(items):
        struct.pack_into("<H", pg, 16 + 2 * i, pos)
        if isinstance(value, tuple) and value[0] == "big":
            _, dsize, ovf = value
            struct.pack_into("<4H", pg, pos, dsize & 0xFFFF, dsize >> 16,
                             0x01, len(key))             # F_BIGDATA
            pg[pos + 8: pos + 8 + len(key)] = key
            struct.pack_into("<Q", pg, pos + 8 + len(key), ovf)
            pos += 8 + len(key) + 8
        else:
            struct.pack_into("<4H", pg, pos, len(value) & 0xFFFF,
                             len(value) >> 16, 0, len(key))
            pg[pos + 8: pos + 8 + len(key)] = key
            pg[pos + 8 + len(key): pos + 8 + len(key) + len(value)] = value
            pos += 8 + len(key) + len(value)
    assert pos <= psize
    return pg


def _lmdb_branch_page(psize, pgno, children):
    """children: list of (key, child_pgno); first key conventionally b''."""
    import struct

    pg = bytearray(psize)
    struct.pack_into("<Q", pg, 0, pgno)
    struct.pack_into("<H", pg, 10, 0x01)                 # P_BRANCH
    nk = len(children)
    struct.pack_into("<H", pg, 12, 16 + 2 * nk)
    pos = 16 + 2 * nk
    for i, (key, child) in enumerate(children):
        struct.pack_into("<H", pg, 16 + 2 * i, pos)
        struct.pack_into("<4H", pg, pos, child & 0xFFFF,
                         (child >> 16) & 0xFFFF, (child >> 32) & 0xFFFF,
                         len(key))
        pg[pos + 8: pos + 8 + len(key)] = key
        pos += 8 + len(key)
    return pg


def _lmdb_overflow_page(psize, pgno, data):
    import struct

    npages = -(-(16 + len(data)) // psize)
    pg = bytearray(npages * psize)
    struct.pack_into("<Q", pg, 0, pgno)
    struct.pack_into("<H", pg, 10, 0x04)                 # P_OVERFLOW
    struct.pack_into("<I", pg, 12, npages)
    pg[16: 16 + len(data)] = data
    return pg


def test_lmdb_reader_leaf_and_overflow(tmp_path):
    from gagan_tpu.data.lmdb_reader import LMDBReader

    psize = 4096
    big = bytes(range(256)) * 40                          # 10240 B, 3 pages
    items = [(b"a", b"val_a"), (b"b", ("big", len(big), 3)),
             (b"c", b"val_c")]
    blob = (_lmdb_meta_page(psize, 1, root=2, entries=3, depth=1)
            + _lmdb_meta_page(psize, 0, root=7, entries=9, depth=1)
            + _lmdb_leaf_page(psize, 2, items)
            + _lmdb_overflow_page(psize, 3, big))
    d = tmp_path / "env"
    d.mkdir()
    (d / "data.mdb").write_bytes(bytes(blob))

    r = LMDBReader(str(d))                                # dir form
    assert len(r) == 3                                    # meta 0 wins (txnid)
    got = list(r)
    assert got == [(b"a", b"val_a"), (b"b", big), (b"c", b"val_c")]
    r.close()


def test_lmdb_reader_branch_tree(tmp_path):
    from gagan_tpu.data.lmdb_reader import LMDBReader

    psize = 4096
    blob = (_lmdb_meta_page(psize, 2, root=2, entries=4, depth=2)
            + _lmdb_meta_page(psize, 1, root=2, entries=4, depth=2)
            + _lmdb_branch_page(psize, 2, [(b"", 3), (b"k3", 4)])
            + _lmdb_leaf_page(psize, 3, [(b"k1", b"v1"), (b"k2", b"v2")])
            + _lmdb_leaf_page(psize, 4, [(b"k3", b"v3"), (b"k4", b"v4")]))
    path = tmp_path / "flat.mdb"                          # NOSUBDIR form
    path.write_bytes(bytes(blob))

    r = LMDBReader(str(path))
    assert [k for k, _ in r] == [b"k1", b"k2", b"k3", b"k4"]
    assert dict(r)[b"k4"] == b"v4"


def test_dataset_tool_lmdb_convert(tmp_path):
    # open_lmdb end-to-end: PNG-encoded values -> dataset zip.
    import io as _io

    import PIL.Image

    from gagan_tpu.data import dataset_tool

    psize = 4096
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
            for _ in range(3)]
    items = []
    for i, img in enumerate(imgs):
        buf = _io.BytesIO()
        PIL.Image.fromarray(img).save(buf, format="png")
        items.append((f"key{i}".encode(), buf.getvalue()))
    blob = (_lmdb_meta_page(psize, 1, root=2, entries=3, depth=1)
            + _lmdb_meta_page(psize, 0, root=2, entries=3, depth=1)
            + _lmdb_leaf_page(psize, 2, items))
    d = tmp_path / "lsun"
    d.mkdir()
    (d / "data.mdb").write_bytes(bytes(blob))

    dest = str(tmp_path / "out.zip")
    dataset_tool.convert_dataset(str(d), dest)

    from gagan_tpu.data import ImageFolderDataset

    ds = ImageFolderDataset(dest)
    assert len(ds) == 3
    img0, _ = ds[0]
    np.testing.assert_array_equal(img0, imgs[0].transpose(2, 0, 1))


def test_dataset_tool_mnist(tmp_path):
    import gzip as _gzip

    from gagan_tpu.data import dataset_tool

    rng = np.random.RandomState(4)
    images = rng.randint(0, 255, (5, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 9, (5,), dtype=np.uint8)
    img_path = str(tmp_path / "train-images-idx3-ubyte.gz")
    lbl_path = str(tmp_path / "train-labels-idx1-ubyte.gz")
    with _gzip.open(img_path, "wb") as f:
        f.write(b"\x00" * 16 + images.tobytes())
    with _gzip.open(lbl_path, "wb") as f:
        f.write(b"\x00" * 8 + labels.tobytes())

    n, it = dataset_tool.open_dataset(img_path, max_images=None)
    assert n == 5
    first = next(it)
    assert first["img"].shape == (32, 32)                 # padded 28->32
    assert first["label"] == int(labels[0])
    np.testing.assert_array_equal(first["img"][2:-2, 2:-2], images[0])
