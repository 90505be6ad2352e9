"""Samplers: infinite shuffled and repeat-factor, optionally host-sharded.

Counterpart of the reference's ``core/utils/my_distributed_sampler.py``
(TrainingSampler :12-54, RepeatFactorTrainingSampler :57-169,
InferenceSampler :172-200). Sharding here is per-HOST (jax.process_index)
rather than per-GPU-rank: devices within a host consume one stacked batch
that the mesh splits.
"""

from __future__ import annotations

import itertools
import math
from typing import Iterator

import numpy as np


class InfiniteSampler:
    """Infinite shuffled index stream, optionally host-sharded."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 shard_id: int = 0, num_shards: int = 1):
        assert size > 0
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards

    def __iter__(self) -> Iterator[int]:
        return itertools.islice(self._infinite(), self.shard_id, None,
                                self.num_shards)

    def _infinite(self) -> Iterator[int]:
        rng = np.random.RandomState(self.seed)
        while True:
            order = rng.permutation(self.size) if self.shuffle \
                else np.arange(self.size)
            yield from order.tolist()


def frame_repeat_factors(frame_category_ids: list[list[int]],
                         repeat_thresh: float) -> np.ndarray:
    """Image-level repeat factors, the reference's exact semantics
    (my_distributed_sampler.py:88-131 / detectron2 LVIS v2 App. B.2):
    f(c) = fraction of FRAMES containing category c; r(c) =
    max(1, sqrt(thr / f(c))); r(frame) = max over its categories.
    Feeds the grouped (frame-sampled) train path."""
    assert frame_category_ids, "frame_repeat_factors needs >=1 frame"
    n = len(frame_category_ids)
    freq: dict[int, float] = {}
    for cats in frame_category_ids:
        for c in set(cats):
            freq[c] = freq.get(c, 0) + 1
    cat_rep = {c: max(1.0, math.sqrt(repeat_thresh / (v / n)))
               for c, v in freq.items()}
    return np.array([max(cat_rep[c] for c in set(cats))
                     for cats in frame_category_ids])


class RepeatFactorSampler(InfiniteSampler):
    """Oversample rare categories: repeat factor
    max(1, sqrt(thr / freq(c))) per record (my_distributed_sampler.py:57-169).

    ``category_ids`` + ``repeat_thresh`` computes per-RECORD factors from
    instance-level frequencies (the flat per-instance path); pass
    precomputed ``repeat_factors`` instead (e.g. ``frame_repeat_factors``)
    for the reference-exact image-level variant on the grouped path.
    """

    def __init__(self, category_ids: list[int] | None = None,
                 repeat_thresh: float = 0.0,
                 shuffle: bool = True, seed: int = 0, shard_id: int = 0,
                 num_shards: int = 1,
                 repeat_factors: np.ndarray | None = None):
        if repeat_factors is not None:
            self._rep = np.asarray(repeat_factors, np.float64)
            n = len(self._rep)
            assert n > 0, "RepeatFactorSampler needs >=1 repeat factor"
        else:
            cats = np.asarray(category_ids)
            n = len(cats)
            # empty input would slip past the base assert via max(...,1)
            # and leave _infinite busy-spinning, yielding nothing forever
            assert n > 0, "RepeatFactorSampler needs a non-empty record list"
            freqs = {c: np.sum(cats == c) / n for c in np.unique(cats)}
            cat_repeat = {c: max(1.0, math.sqrt(repeat_thresh / f))
                          for c, f in freqs.items()}
            self._rep = np.array([cat_repeat[c] for c in cats])
        self._n_records = n
        # nominal size for the base-class bookkeeping (the actual epoch
        # length varies with the per-epoch stochastic rounding below)
        super().__init__(max(int(self._rep.sum()), 1), shuffle, seed,
                         shard_id, num_shards)

    def _infinite(self) -> Iterator[int]:
        rng = np.random.RandomState(self.seed)
        floor = np.floor(self._rep)
        frac = self._rep - floor
        while True:
            # re-round the fractional repeats EVERY epoch (reference
            # _get_epoch_indices, my_distributed_sampler.py:120-140): a
            # one-time rounding would freeze each 1.5x record at 1x or 2x
            # for the whole run instead of averaging 1.5x
            rounded = (floor + (rng.rand(self._n_records) < frac)
                       ).astype(int)
            indices = np.repeat(np.arange(self._n_records), rounded)
            if self.shuffle:
                indices = indices[rng.permutation(len(indices))]
            yield from indices.tolist()

# (eval-time host sharding lives in engine/eval_runner.py
# shard_records_by_frame — frame granularity, so multi-instance frames
# never straddle hosts)
