"""Running metric pools (capability parity: reference ``utils/misc.py:71-145``)."""

from __future__ import annotations

import numpy as np


class SimplePool:
    """FIFO pool of scalars with windowed mean (n=100 train, n=10000 eval)."""

    def __init__(self, pool_size: int):
        assert pool_size > 0
        self.pool_size = pool_size
        self.items: list = []

    def __len__(self) -> int:
        return len(self.items)

    def update(self, items) -> None:
        for item in items:
            if len(self.items) >= self.pool_size:
                self.items.pop(0)
            self.items.append(float(item))

    def mean(self) -> float:
        if not self.items:
            return float("nan")
        return float(np.mean(self.items))

    def is_full(self) -> bool:
        return len(self.items) == self.pool_size

    def empty(self) -> None:
        self.items = []

    def fetch(self) -> np.ndarray:
        return np.asarray(self.items)
