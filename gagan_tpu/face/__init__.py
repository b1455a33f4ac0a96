"""Face detection & alignment used by the encoder/inversion preprocessing.

Reference parity: SimilarDomains/restyle_encoders/mtcnn/ (PNet/RNet/ONet +
cp2tform alignment) and the FFHQ quad-crop in core/utils/common.py:251-333.
"""

from gagan_tpu.face.align import (align_face, get_reference_facial_points,
                                  get_similarity_transform_cv2,
                                  warp_and_crop_face)
from gagan_tpu.face.mtcnn import MTCNN, detect_faces

__all__ = [
    "MTCNN", "detect_faces", "align_face", "warp_and_crop_face",
    "get_reference_facial_points", "get_similarity_transform_cv2",
]
