"""Single/few style-image dataset for the SimilarDomains adaptation
trainers (reference: SimilarDomains/core/dataset.py:34-77).

Returns each image as an aligned-or-resized high-res / 256-lowres pair in
both uint8 HWC and normalized [-1, 1] CHW float form.  Alignment is
landmark-based and dlib-free: pass ``landmark_fn`` (e.g. built on
``gagan_tpu.face.MTCNN`` + any 68-point model) — the reference hardcodes a
dlib shape predictor (dataset.py:53-55), which this image does not ship.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, List, Optional, Union

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".tiff")


def is_image_file(filename: str) -> bool:
    return filename.lower().endswith(IMG_EXTENSIONS)


def make_dataset(directory: str) -> List[str]:
    assert os.path.isdir(directory), f"{directory} is not a valid directory"
    images = []
    for root, _, fnames in sorted(os.walk(directory)):
        images.extend(os.path.join(root, f) for f in fnames
                      if is_image_file(f))
    return images


def _to_float_chw(img) -> np.ndarray:
    arr = np.asarray(img, np.float32) / 255.0
    return ((arr - 0.5) / 0.5).transpose(2, 0, 1)


class ImagesDataset:
    """Iterable of style-image records (dataset.py:34-77)."""

    def __init__(self, size: int,
                 image_path: Union[str, List[str]],
                 align_input: bool = False,
                 landmark_fn: Optional[Callable] = None):
        if isinstance(image_path, (list, tuple)):
            self.image_paths = list(image_path)
        elif os.path.isdir(image_path):
            self.image_paths = sorted(make_dataset(image_path))
        elif os.path.isfile(image_path):
            self.image_paths = [image_path]
        else:
            raise ValueError(
                f"Incorrect 'image_path' argument in ImagesDataset, "
                f"{image_path}")
        self.size = size
        self.align_input = align_input
        if align_input and landmark_fn is None:
            raise ValueError(
                "align_input=True needs a landmark_fn(image) -> [68, 2] "
                "(dlib is not available; see gagan_tpu.face.align_face)")
        self.landmark_fn = landmark_fn

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, index: int) -> dict:
        import PIL.Image

        from gagan_tpu.face.align import align_face

        path = Path(self.image_paths[index])
        img = PIL.Image.open(str(path)).convert("RGB")
        if self.align_input:
            im_h = align_face(img, self.landmark_fn(img),
                              output_size=self.size)
        else:
            im_h = img.resize((self.size, self.size))
        lanczos = getattr(PIL.Image, "Resampling", PIL.Image).LANCZOS
        im_l = im_h.resize((256, 256), lanczos)
        return {
            "image_high_res": np.asarray(im_h, np.uint8),
            "image_low_res": np.asarray(im_l, np.uint8),
            "image_high_res_t": _to_float_chw(im_h),
            "image_low_res_t": _to_float_chw(im_l),
            "image_name": path.stem,
        }
