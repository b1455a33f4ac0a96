"""Dataset preprocessing: convert image collections into the uniform
dataset-zip format (uncompressed PNGs + dataset.json labels).

Re-implementation of the reference `dataset_tool.py` (`dataset_tool.py:326-475`,
`make_transform:211`): folder / zip / LMDB(LSUN) / CIFAR-10 / MNIST readers,
scale and center-crop(-wide) transforms, square power-of-two resolution
enforcement.  The LMDB path uses a pure-Python on-disk-format reader
(gagan_tpu.data.lmdb_reader) instead of the `lmdb` package
(`dataset_tool.py:117-141`).
"""

from __future__ import annotations

import functools
import io
import json
import os
import pickle
import tarfile
import zipfile
from typing import Callable, Iterator, Optional, Tuple

import numpy as np
import PIL.Image

try:
    import click
except ImportError:  # pragma: no cover
    click = None


def error(msg):
    raise click.ClickException(msg) if click else SystemExit(msg)


def maybe_min(a: int, b: Optional[int]) -> int:
    return min(a, b) if b is not None else a


def open_image_folder(source_dir, *, max_images: Optional[int]):
    PIL.Image.init()
    input_images = [
        os.path.join(root, fname)
        for root, _dirs, files in os.walk(source_dir)
        for fname in sorted(files)
        if os.path.splitext(fname)[1].lower() in PIL.Image.EXTENSION
    ]
    input_images = sorted(input_images)

    labels = {}
    meta_fname = os.path.join(source_dir, "dataset.json")
    if os.path.isfile(meta_fname):
        with open(meta_fname, "r") as f:
            labels = json.load(f)["labels"]
            labels = dict(labels) if labels is not None else {}

    max_idx = maybe_min(len(input_images), max_images)

    def iterate_images():
        for idx, fname in enumerate(input_images):
            arch_fname = os.path.relpath(fname, source_dir).replace("\\", "/")
            img = np.array(PIL.Image.open(fname).convert("RGB"))
            yield dict(img=img, label=labels.get(arch_fname))
            if idx >= max_idx - 1:
                break

    return max_idx, iterate_images()


def open_image_zip(source, *, max_images: Optional[int]):
    with zipfile.ZipFile(source) as z:
        PIL.Image.init()
        input_images = [
            f for f in sorted(z.namelist())
            if os.path.splitext(f)[1].lower() in PIL.Image.EXTENSION
        ]
        labels = {}
        if "dataset.json" in z.namelist():
            with z.open("dataset.json", "r") as f:
                labels = json.load(f)["labels"]
                labels = dict(labels) if labels is not None else {}

    max_idx = maybe_min(len(input_images), max_images)

    def iterate_images():
        with zipfile.ZipFile(source) as z:
            for idx, fname in enumerate(input_images):
                with z.open(fname, "r") as f:
                    img = np.array(PIL.Image.open(f).convert("RGB"))
                yield dict(img=img, label=labels.get(fname))
                if idx >= max_idx - 1:
                    break

    return max_idx, iterate_images()


def open_lmdb(lmdb_dir: str, *, max_images: Optional[int]):
    """LSUN-style LMDB of encoded images (dataset_tool.py:117-141); decoded
    with PIL (the reference prefers cv2 and falls back to PIL — identical
    pixels for the webp/jpg content LSUN ships)."""
    from gagan_tpu.data.lmdb_reader import LMDBReader

    reader = LMDBReader(lmdb_dir)
    max_idx = maybe_min(len(reader), max_images)

    def iterate_images():
        for idx, (_key, value) in enumerate(reader):
            try:
                img = np.array(PIL.Image.open(io.BytesIO(value))
                               .convert("RGB"))
                yield dict(img=img, label=None)
            except Exception as e:  # mirror the reference's skip-and-print
                print(e)
                continue
            if idx >= max_idx - 1:
                break

    return max_idx, iterate_images()


def open_mnist(images_gz: str, *, max_images: Optional[int]):
    """MNIST idx-ubyte pair, padded 28->32 (dataset_tool.py:180-205)."""
    import gzip

    labels_gz = images_gz.replace("-images-idx3-ubyte.gz",
                                  "-labels-idx1-ubyte.gz")
    assert labels_gz != images_gz
    with gzip.open(images_gz, "rb") as f:
        images = np.frombuffer(f.read(), np.uint8, offset=16)
    with gzip.open(labels_gz, "rb") as f:
        labels = np.frombuffer(f.read(), np.uint8, offset=8)
    images = images.reshape(-1, 28, 28)
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)], "constant",
                    constant_values=0)
    assert images.shape[0] == labels.shape[0]
    max_idx = maybe_min(len(images), max_images)

    def iterate_images():
        for idx, img in enumerate(images):
            yield dict(img=img, label=int(labels[idx]))
            if idx >= max_idx - 1:
                break

    return max_idx, iterate_images()


def open_cifar10(tarball: str, *, max_images: Optional[int]):
    images = []
    labels = []
    with tarfile.open(tarball, "r:gz") as tar:
        for batch in range(1, 6):
            member = tar.getmember(f"cifar-10-batches-py/data_batch_{batch}")
            with tar.extractfile(member) as f:
                data = pickle.load(f, encoding="latin1")
            images.append(data["data"].reshape(-1, 3, 32, 32))
            labels.append(data["labels"])
    images = np.concatenate(images).transpose(0, 2, 3, 1)  # NHWC
    labels = np.concatenate([np.asarray(l) for l in labels])
    max_idx = maybe_min(len(images), max_images)

    def iterate_images():
        for idx, img in enumerate(images):
            yield dict(img=img, label=int(labels[idx]))
            if idx >= max_idx - 1:
                break

    return max_idx, iterate_images()


def open_dataset(source, *, max_images: Optional[int]):
    if os.path.isdir(source):
        if os.path.isfile(os.path.join(source, "data.mdb")):
            return open_lmdb(source, max_images=max_images)
        return open_image_folder(source, max_images=max_images)
    if os.path.isfile(source):
        if os.path.basename(source) == "cifar-10-python.tar.gz":
            return open_cifar10(source, max_images=max_images)
        if source.endswith("-images-idx3-ubyte.gz"):
            return open_mnist(source, max_images=max_images)
        if os.path.splitext(source)[1].lower() in (".mdb", ".lmdb"):
            return open_lmdb(source, max_images=max_images)
        if os.path.splitext(source)[1].lower() == ".zip":
            return open_image_zip(source, max_images=max_images)
    error(f"Missing or unsupported input: {source}")


def make_transform(
    transform: Optional[str],
    output_width: Optional[int],
    output_height: Optional[int],
    resize_filter: str = "lanczos",
) -> Callable[[np.ndarray], Optional[np.ndarray]]:
    """Scale / center-crop / center-crop-wide (dataset_tool.py:211-266)."""
    resample = {"box": PIL.Image.BOX, "lanczos": PIL.Image.LANCZOS}[resize_filter]

    def scale(width, height, img):
        w, h = img.shape[1], img.shape[0]
        if width == w and height == h:
            return img
        img = PIL.Image.fromarray(img)
        ww = width if width is not None else w
        hh = height if height is not None else h
        return np.array(img.resize((ww, hh), resample))

    def center_crop(width, height, img):
        crop = np.min(img.shape[:2])
        img = img[(img.shape[0] - crop) // 2: (img.shape[0] + crop) // 2,
                  (img.shape[1] - crop) // 2: (img.shape[1] + crop) // 2]
        img = PIL.Image.fromarray(img, "RGB")
        return np.array(img.resize((width, height), resample))

    def center_crop_wide(width, height, img):
        ch = int(np.round(width * img.shape[0] / img.shape[1]))
        if img.shape[1] < width or ch < height:
            return None
        img = img[(img.shape[0] - ch) // 2: (img.shape[0] + ch) // 2]
        img = PIL.Image.fromarray(img, "RGB")
        img = np.array(img.resize((width, height), resample))
        canvas = np.zeros([width, width, 3], dtype=np.uint8)
        canvas[(width - height) // 2: (width + height) // 2, :] = img
        return canvas

    if transform is None:
        return functools.partial(scale, output_width, output_height)
    if transform == "center-crop":
        assert output_width and output_height
        return functools.partial(center_crop, output_width, output_height)
    if transform == "center-crop-wide":
        assert output_width and output_height
        return functools.partial(center_crop_wide, output_width, output_height)
    error(f"Unknown transform: {transform}")


def open_dest(dest: str):
    ext = os.path.splitext(dest)[1].lower()
    if ext == ".zip":
        if os.path.dirname(dest):
            os.makedirs(os.path.dirname(dest), exist_ok=True)
        zf = zipfile.ZipFile(dest, mode="w", compression=zipfile.ZIP_STORED)

        def save_bytes(fname, data):
            zf.writestr(fname, data)

        return "", save_bytes, zf.close

    os.makedirs(dest, exist_ok=True)

    def save_bytes(fname, data):
        path = os.path.join(dest, fname)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    return dest, save_bytes, lambda: None


def convert_dataset(
    source: str,
    dest: str,
    max_images: Optional[int] = None,
    transform: Optional[str] = None,
    resize_filter: str = "lanczos",
    width: Optional[int] = None,
    height: Optional[int] = None,
) -> None:
    """Convert to the uniform dataset zip (dataset_tool.py:326-475)."""
    PIL.Image.init()
    num_files, input_iter = open_dataset(source, max_images=max_images)
    _root, save_bytes, close_dest = open_dest(dest)
    transform_image = make_transform(transform, width, height, resize_filter)

    dataset_attrs = None
    labels = []
    for idx, image in enumerate(input_iter):
        idx_str = f"{idx:08d}"
        archive_fname = f"{idx_str[:5]}/img{idx_str}.png"

        img = transform_image(image["img"])
        if img is None:
            continue

        channels = img.shape[2] if img.ndim == 3 else 1
        cur_attrs = {"width": img.shape[1], "height": img.shape[0],
                     "channels": channels}
        if dataset_attrs is None:
            dataset_attrs = cur_attrs
            w, h = dataset_attrs["width"], dataset_attrs["height"]
            if w != h:
                error(f"Images must be square; got {w}x{h}")
            if w & (w - 1) != 0:
                error(f"Image width/height must be a power of two; got {w}")
        elif cur_attrs != dataset_attrs:
            error("Images do not all have the same dimensions/channels")

        img_pil = PIL.Image.fromarray(
            img, {1: "L", 3: "RGB"}[channels])
        buf = io.BytesIO()
        img_pil.save(buf, format="png", compress_level=0, optimize=False)
        save_bytes(archive_fname, buf.getbuffer())
        labels.append([archive_fname, image["label"]]
                      if image["label"] is not None else None)

    metadata = {
        "labels": labels if all(x is not None for x in labels) else None
    }
    save_bytes("dataset.json", json.dumps(metadata))
    close_dest()


if click is not None:

    @click.command()
    @click.option("--source", required=True, metavar="PATH")
    @click.option("--dest", required=True, metavar="PATH")
    @click.option("--max-images", type=int, default=None)
    @click.option("--resize-filter", type=click.Choice(["box", "lanczos"]),
                  default="lanczos", show_default=True)
    @click.option("--transform",
                  type=click.Choice(["center-crop", "center-crop-wide"]))
    @click.option("--width", type=int)
    @click.option("--height", type=int)
    def main(source, dest, max_images, resize_filter, transform, width, height):
        """Convert an image dataset into the uniform dataset-zip format."""
        convert_dataset(source, dest, max_images=max_images,
                        transform=transform, resize_filter=resize_filter,
                        width=width, height=height)


if __name__ == "__main__":
    main()
