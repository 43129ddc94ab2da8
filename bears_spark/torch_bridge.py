"""PyTorch IterableDataset bridge over the chunk feed.

Reference parity: ScalableDataFrameDataset
(src/bears/core/frame/ScalableDataFrameDataset.py:14-72) — an
IterableDataset that streams SDF chunks to a torch DataLoader, with
per-worker sharding.

torch is not installed in this container: the import is gated, and
``FrameIterable`` degrades to a plain Python iterable with identical
semantics (so the chunking/sharding logic is testable without torch).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

try:  # pragma: no cover - torch not in this environment
    import torch.utils.data as _tud

    _BASE = _tud.IterableDataset
    _HAS_TORCH = True
except ImportError:
    _BASE = object
    _HAS_TORCH = False


class FrameIterable(_BASE):
    """Iterate a SparkFrame/DataFrame as fixed-size chunks for DL training.

    With torch installed this is a real IterableDataset: each DataLoader
    worker reads only its shard (torch worker_info shard ∘ the optional
    distributed (rank, world_size) shard). Without torch it's a plain
    iterable with the same chunking.
    """

    def __init__(
        self,
        frame,
        batch_rows: int,
        shuffle: bool = False,
        seed: int | None = None,
        rank: int | None = None,
        world_size: int | None = None,
        drop_last: bool = True,
        transform: Callable[[Any], Any] | None = None,
        stream_as: str = "dict",
        tensor_backend: str | None = None,
    ):
        self.frame = frame
        self.batch_rows = batch_rows
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.drop_last = drop_last
        self.transform = transform
        self.stream_as = stream_as
        # tensor_backend="torch"/"tensorflow"/"jax"/"numpy" converts each
        # dict chunk via tensor_bridge.as_tensors before any transform
        self.tensor_backend = tensor_backend

    def _shard_params(self) -> tuple[int | None, int | None]:
        rank, world = self.rank, self.world_size
        if _HAS_TORCH:
            info = _tud.get_worker_info()
            if info is not None and info.num_workers > 1:
                # compose distributed shard with DataLoader-worker shard
                base_rank = rank or 0
                base_world = world or 1
                rank = base_rank * info.num_workers + info.id
                world = base_world * info.num_workers
        return rank, world

    def __iter__(self) -> Iterator:
        from bears_spark.stream import stream_frame

        rank, world = self._shard_params()
        it = stream_frame(
            self.frame,
            num_rows=self.batch_rows,
            stream_as=self.stream_as,
            shuffle=self.shuffle,
            seed=self.seed,
            shard_rank=rank,
            world_size=world,
            drop_last=self.drop_last,
        )
        for chunk in it:
            if self.tensor_backend is not None:
                from bears_spark.tensor_bridge import as_tensors

                chunk = as_tensors(chunk, backend=self.tensor_backend)
            yield self.transform(chunk) if self.transform else chunk
