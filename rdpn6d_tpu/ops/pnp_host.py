"""Host 2D-3D PnP wrappers (OpenCV), for parity with the reference's eval
modes.

Counterpart of ``lib/pysixd/misc.py:145-195`` (pnp / pnp_v2 with
EPNP+RANSAC+iterative refinement) and the evaluator's correspondence
extraction ``get_img_model_points_with_coords2d``
(gdrn_evaluator.py:89-126). The TPU-native path prefers the on-device
RANSAC-Kabsch (ops/ransac_kabsch.py); these host functions exist for
cross-checking and for RGB-only operation.
"""

from __future__ import annotations

import numpy as np


def pnp_ransac(points_3d: np.ndarray, points_2d: np.ndarray,
               K: np.ndarray, method: str = "ransac_epnp",
               reprojection_error: float = 3.0,
               iterations: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Solve (R, t) from 2D-3D correspondences. Returns R [3,3], t [3]."""
    import cv2

    p3 = np.ascontiguousarray(points_3d, np.float64).reshape(-1, 1, 3)
    p2 = np.ascontiguousarray(points_2d, np.float64).reshape(-1, 1, 2)
    if p3.shape[0] < 4:
        # a tiny/empty predicted mask legitimately yields <4 points;
        # cv2.solvePnP* would throw — return the documented identity
        # fallback instead of crashing the evaluator
        return np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    dist = np.zeros((8, 1))
    if method == "iterative":
        ok, rvec, tvec = cv2.solvePnP(p3, p2, K.astype(np.float64), dist,
                                      flags=cv2.SOLVEPNP_ITERATIVE)
    else:
        ok, rvec, tvec, inliers = cv2.solvePnPRansac(
            p3, p2, K.astype(np.float64), dist,
            flags=cv2.SOLVEPNP_EPNP,
            reprojectionError=reprojection_error,
            iterationsCount=iterations)
        if ok and inliers is not None and len(inliers) >= 4:
            # iterative refinement on the INLIERS (pnp_v2 behavior,
            # misc.py:145-195) — refining on all points would pull the
            # pose back toward the outliers RANSAC just rejected
            sel = inliers.reshape(-1)
            ok2, rvec2, tvec2 = cv2.solvePnP(
                p3[sel], p2[sel], K.astype(np.float64), dist, rvec, tvec,
                useExtrinsicGuess=True, flags=cv2.SOLVEPNP_ITERATIVE)
            if ok2:
                rvec, tvec = rvec2, tvec2
    if not ok:
        return np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    R = cv2.Rodrigues(rvec)[0]
    return R.astype(np.float32), tvec.reshape(3).astype(np.float32)


def correspondences_from_maps(coord_model: np.ndarray, mask: np.ndarray,
                              bbox_center: np.ndarray, scale: float,
                              out_res: int | None = None,
                              max_points: int = 2000,
                              seed: int = 0
                              ) -> tuple[np.ndarray, np.ndarray]:
    """Dense-map -> (points_3d, points_2d) in ORIGINAL image pixels.

    coord_model [H, W, 3] model-frame coordinates at head resolution; the
    2D pixel of map cell (r, c) is the inverse of the crop affine
    (gdrn_evaluator.py:89-126). ``out_res`` defaults to the map's own
    resolution — a mismatched explicit value would silently scale the 2D
    points wrong.
    """
    H, W = mask.shape
    if out_res is None:
        out_res = H
    ys, xs = np.nonzero(mask > 0)
    if len(xs) == 0:
        return np.zeros((0, 3)), np.zeros((0, 2))
    if len(xs) > max_points:
        idx = np.random.RandomState(seed).choice(len(xs), max_points,
                                                 replace=False)
        ys, xs = ys[idx], xs[idx]
    p3 = coord_model[ys, xs]
    r = scale / out_res
    u = bbox_center[0] + (xs - out_res / 2.0) * r
    v = bbox_center[1] + (ys - out_res / 2.0) * r
    return p3, np.stack([u, v], -1)
