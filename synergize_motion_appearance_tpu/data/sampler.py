"""EnlargedSampler semantics (parity target: data/data_sampler.py:6-48).

Virtually enlarges the dataset by `ratio`, epoch-seeded shuffle, per-host
strided slice — the host-sharded input pipeline for the data mesh axis.

DELIBERATE DEPARTURE (documented, see README "departures"): the reference
shuffles with `torch.randperm(generator.manual_seed(epoch))`
(data_sampler.py:29-42); this port uses
`np.random.RandomState(epoch).permutation`. The semantics are identical
(epoch-deterministic, rank-strided, ratio-enlarged) but the concrete
permutation SEQUENCES differ, so a torch reference run and a run here
visit samples in different orders — exact run-for-run replication of a
reference training log is not possible, by design (keeping torch out of
the training-loop dependency set).
"""
from __future__ import annotations

import math
from typing import Iterator, List

import numpy as np


class EnlargedSampler:
    def __init__(self, num_samples: int, num_replicas: int, rank: int,
                 ratio: int = 1):
        self.dataset_len = num_samples
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = math.ceil(
            num_samples * ratio / num_replicas
        )
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.RandomState(self.epoch)
        indices = rng.permutation(self.total_size).tolist()
        indices = indices[self.rank:self.total_size:self.num_replicas]
        return iter(idx % self.dataset_len for idx in indices)

    def __len__(self) -> int:
        return self.num_samples
