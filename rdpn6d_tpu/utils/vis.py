"""Visualization helpers (matplotlib-gated).

Counterpart of the reference's ``lib/vis_utils/image.py`` (grid_show, bbox
and mask overlays) — enough to reproduce the trainer's TensorBoard image
panels (engine.py:331-367) and debugging views.
"""

from __future__ import annotations

import numpy as np


def grid_show(images: list[np.ndarray], titles: list[str] | None = None,
              rows: int = 1, save_path: str | None = None):
    """Show/save a grid of images. Returns the figure."""
    if save_path:
        # only headless saving needs Agg; switching the process-global
        # backend unconditionally would break interactive sessions
        import matplotlib

        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    cols = (n + rows - 1) // rows
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i, img in enumerate(images):
        ax = axes[i // cols][i % cols]
        im = np.asarray(img)
        if im.ndim == 2:
            ax.imshow(im, cmap="viridis")
        else:
            ax.imshow(np.clip(im, 0, 1) if im.dtype.kind == "f" else im)
        if titles and i < len(titles):
            ax.set_title(titles[i], fontsize=8)
        ax.axis("off")
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig


def draw_bbox(img: np.ndarray, bbox_xyxy, color=(0, 255, 0),
              thickness: int = 2) -> np.ndarray:
    import cv2

    out = np.ascontiguousarray(img).copy()
    x1, y1, x2, y2 = [int(v) for v in bbox_xyxy]
    cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
    return out


def overlay_mask(img: np.ndarray, mask: np.ndarray,
                 color=(0, 120, 255), alpha: float = 0.5) -> np.ndarray:
    out = np.asarray(img, np.float32).copy()
    m = np.asarray(mask, bool)
    out[m] = (1 - alpha) * out[m] + alpha * np.asarray(color, np.float32)
    return out.astype(img.dtype if np.asarray(img).dtype.kind == "u"
                      else np.float32)


def colorize_coords(coord: np.ndarray) -> np.ndarray:
    """Normalized [H, W, 3] coordinate map -> displayable RGB in [0, 1]."""
    c = np.asarray(coord, np.float32)
    lo, hi = np.nanmin(c), np.nanmax(c)
    return (c - lo) / max(hi - lo, 1e-6)


def draw_pose_axes(img: np.ndarray, K: np.ndarray, R: np.ndarray,
                   t: np.ndarray, length: float = 0.05) -> np.ndarray:
    """Project and draw the object's coordinate axes."""
    import cv2

    pts = np.float32([[0, 0, 0], [length, 0, 0], [0, length, 0],
                      [0, 0, length]])
    cam = pts @ R.T + t
    out = np.ascontiguousarray(img).copy()
    if cam[0, 2] <= 1e-6:  # origin behind the camera: nothing to anchor
        return out
    uv = (cam @ K.T)
    uv = np.clip(uv[:, :2] / np.maximum(uv[:, 2:3], 1e-6),
                 -1e6, 1e6).astype(int)
    for i, color in zip((1, 2, 3),
                        ((0, 0, 255), (0, 255, 0), (255, 0, 0))):
        if cam[i, 2] > 1e-6:  # skip only the axis that crosses the
            cv2.line(out, tuple(uv[0]), tuple(uv[i]), color, 2)  # near plane
    return out
