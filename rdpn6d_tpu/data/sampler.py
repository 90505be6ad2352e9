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


class RepeatFactorSampler(InfiniteSampler):
    """Oversample rare categories: repeat factor
    max(1, sqrt(thr / freq(c))) per record (my_distributed_sampler.py:57-169).
    """

    def __init__(self, category_ids: list[int], repeat_thresh: float,
                 shuffle: bool = True, seed: int = 0, shard_id: int = 0,
                 num_shards: int = 1):
        cats = np.asarray(category_ids)
        n = len(cats)
        # empty input would slip past the base assert via max(...,1) and
        # leave _infinite busy-spinning, yielding nothing forever
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
