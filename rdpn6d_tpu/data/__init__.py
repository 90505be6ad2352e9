"""Data layer: refs, BOP records, IO, on-device preprocessing, loaders."""

from .bop import Split, available_splits, build_split_records, get_split, register_split
from .custom import register_custom_dataset
from .pipeline import coord_2d_map, dzi_jitter, preprocess_batch, preprocess_roi
from .refs import REFS, DatasetRef, get_ref
from .synthetic import cube_points, dummy_train_batch, render_cube_depth

__all__ = [
    "Split", "available_splits", "build_split_records", "get_split",
    "register_split", "register_custom_dataset", "coord_2d_map",
    "dzi_jitter", "preprocess_batch", "preprocess_roi", "REFS",
    "DatasetRef", "get_ref", "cube_points", "dummy_train_batch",
    "render_cube_depth",
]
