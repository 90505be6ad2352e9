"""Mask utilities: COCO-style RLE encode/decode, edges, morphology.

Counterpart of the reference's ``lib/utils/mask_utils.py`` (RLE<->mask,
edge extraction, dilation) without the pycocotools dependency — pure numpy
uncompressed RLE plus cv2 morphology.
"""

from __future__ import annotations

import numpy as np


def mask_to_rle(mask: np.ndarray) -> dict:
    """Binary [H, W] -> uncompressed COCO RLE (column-major counts)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.flatten()  # Fortran order
    # run lengths, starting with zeros-run
    diff = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    runs = np.diff(np.concatenate([[0], diff, [len(flat)]]))
    counts = runs.tolist()
    if flat[0]:  # RLE starts with a zero-run by convention
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in rle["counts"]:
        if val:
            flat[pos:pos + c] = True
        pos += c
        val = not val
    if pos != h * w:
        # numpy slicing clamps silently — a truncated/corrupt RLE would
        # otherwise decode into a plausible-looking wrong mask
        raise ValueError(f"RLE counts sum to {pos}, expected {h * w}")
    return flat.reshape(w, h).T


def mask_edges(mask: np.ndarray, kernel: int = 3) -> np.ndarray:
    """Edge band of a binary mask (morphological gradient)."""
    import cv2

    m = np.asarray(mask, np.uint8)
    k = np.ones((kernel, kernel), np.uint8)
    return (cv2.morphologyEx(m, cv2.MORPH_GRADIENT, k) > 0).astype(np.uint8)


def dilate_mask(mask: np.ndarray, kernel: int = 3,
                iterations: int = 1) -> np.ndarray:
    import cv2

    k = np.ones((kernel, kernel), np.uint8)
    return cv2.dilate(np.asarray(mask, np.uint8), k,
                      iterations=iterations)


def erode_mask(mask: np.ndarray, kernel: int = 3,
               iterations: int = 1) -> np.ndarray:
    import cv2

    k = np.ones((kernel, kernel), np.uint8)
    return cv2.erode(np.asarray(mask, np.uint8), k, iterations=iterations)


def mask_bbox_xyxy(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4, np.float32)
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
