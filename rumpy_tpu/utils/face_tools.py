"""Face tooling: detection, alignment, segmentation.

Reference: rumpy/sr_tools/{yolo_detection,face_segmentation,
face_aligner.py}. All three depend on external pretrained weights (YOLOv3
face darknet files, BiSeNet checkpoint) that are not shipped in this
image; construction is gated on weight paths, matching the reference's
pattern of user-supplied model files. The aligner is weight-free and
fully functional.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


class YoloFaceDetector:
    """YOLOv3 face detection via OpenCV DNN
    (sr_tools/yolo_detection/yolo_detector.py:13-34)."""

    def __init__(self, cfg_path: Optional[str] = None,
                 weights_path: Optional[str] = None,
                 conf_threshold: float = 0.5, nms_threshold: float = 0.4,
                 input_size: int = 416):
        if not cfg_path or not weights_path:
            raise NotImplementedError(
                "YOLO face detection needs darknet cfg+weights files "
                "(pass cfg_path/weights_path)")
        import cv2
        self.net = cv2.dnn.readNetFromDarknet(cfg_path, weights_path)
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.input_size = input_size

    def detect(self, image_bgr: np.ndarray) -> List[Tuple[int, int, int, int]]:
        import cv2
        h, w = image_bgr.shape[:2]
        blob = cv2.dnn.blobFromImage(image_bgr, 1 / 255.0,
                                     (self.input_size, self.input_size),
                                     swapRB=True, crop=False)
        self.net.setInput(blob)
        names = self.net.getUnconnectedOutLayersNames()
        outs = self.net.forward(names)
        boxes, confs = [], []
        for out in outs:
            for det in out:
                conf = float(det[4])
                if conf > self.conf_threshold:
                    cx, cy, bw, bh = det[0] * w, det[1] * h, det[2] * w, det[3] * h
                    boxes.append([int(cx - bw / 2), int(cy - bh / 2),
                                  int(bw), int(bh)])
                    confs.append(conf)
        keep = cv2.dnn.NMSBoxes(boxes, confs, self.conf_threshold,
                                self.nms_threshold)
        return [tuple(boxes[int(i)]) for i in np.asarray(keep).reshape(-1)]


class FaceAligner:
    """Landmark-based affine alignment (sr_tools/face_aligner.py):
    similarity transform mapping eye landmarks to canonical positions."""

    def __init__(self, output_size: Tuple[int, int] = (128, 128),
                 left_eye=(0.35, 0.35), right_eye=(0.65, 0.35)):
        self.output_size = output_size
        self.left_eye = left_eye
        self.right_eye = right_eye

    def align(self, image: np.ndarray,
              landmarks: Sequence[Tuple[float, float]]) -> np.ndarray:
        import cv2
        lm = np.asarray(landmarks, np.float32)
        le, re = lm[0], lm[1]
        w, h = self.output_size
        dst = np.float32([[self.left_eye[0] * w, self.left_eye[1] * h],
                          [self.right_eye[0] * w, self.right_eye[1] * h]])
        src = np.float32([le, re])
        m, _ = cv2.estimateAffinePartial2D(src.reshape(-1, 1, 2),
                                           dst.reshape(-1, 1, 2))
        return cv2.warpAffine(image, m, self.output_size)


# Full flax BiSeNet lives in utils/face_segmentation.py; re-exported here
# so the reference's import location (face tools) keeps working.
from rumpy_tpu.utils.face_segmentation import BiSeNetSegmenter  # noqa: E402,F401


def crop_faces(image: np.ndarray, detector: YoloFaceDetector,
               margin: float = 0.2) -> List[np.ndarray]:
    crops = []
    for (x, y, w, h) in detector.detect(image[..., ::-1]):
        mx, my = int(w * margin), int(h * margin)
        x0, y0 = max(0, x - mx), max(0, y - my)
        crops.append(image[y0:y + h + my, x0:x + w + mx])
    return crops
