"""Host->device input prefetching.

Overlaps the next batch's host preparation + device transfer with the
current step's compute (the standard JAX input-pipeline idiom; the
reference relies on torch DataLoader worker prefetch only — transfers
stayed synchronous)."""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional


def device_prefetch(
    iterator: Iterable,
    prepare: Optional[Callable] = None,
    size: int = 2,
) -> Iterator:
    """Yield items with up to `size` batches already prepared/transferred.

    `prepare` maps a raw host batch to device arrays (e.g. shard_batch +
    device_preprocess); transfers are async in JAX, so filling the queue
    dispatches them ahead of consumption.
    """
    queue = collections.deque()
    it = iter(iterator)

    def enqueue(n):
        for _ in range(n):
            try:
                item = next(it)
            except StopIteration:
                return
            queue.append(prepare(item) if prepare is not None else item)

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
