"""Tensor column bridges: Spark array columns <-> framework tensors.

Reference parity: TensorScalableSeries
(src/bears/core/frame/TensorScalableSeries.py:12) — series whose values are
torch/tf tensors with numpy interop. Spark-first re-expression: tensors live
in DataFrames as ``array<float>`` (or nested arrays) columns; the bridge
materializes stream chunks as STACKED contiguous ndarrays and hands them to
torch / tensorflow / jax at the training boundary. None of the three
frameworks is installed in this container, so every conversion is
import-gated and the numpy path (always available) carries the tests.

Scale note: conversion happens per-chunk on the consuming worker, never on
the driver for the whole dataset — the Spark plan upstream stays lazy and
distributed; only the requested batch crosses into framework memory.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

_BACKENDS = ("numpy", "torch", "tensorflow", "jax")


def stack_array_column(values: np.ndarray) -> np.ndarray:
    """Stack an object-dtype column of equal-length vectors into a dense 2D
    float array (the layout every DL framework wants); scalar columns pass
    through 1D."""
    if values.dtype != object:
        return values
    if len(values) == 0:
        return np.empty((0, 0), dtype=np.float32)
    return np.stack([np.asarray(v, dtype=np.float32) for v in values])


def as_tensors(chunk: dict[str, np.ndarray], backend: str = "numpy") -> dict[str, Any]:
    """Convert a dict-of-ndarrays chunk to the requested framework's tensors.

    numpy -> identity (after stacking array columns); torch/tensorflow/jax
    are zero-copy where the framework supports it (torch.from_numpy,
    tf.convert_to_tensor, jnp.asarray) and raise ImportError with a clear
    message when the framework is absent.
    """
    if backend not in _BACKENDS:
        raise ValueError(f"backend must be one of {_BACKENDS}, got {backend!r}")
    dense = {k: stack_array_column(np.asarray(v)) for k, v in chunk.items()}
    if backend == "numpy":
        return dense
    if backend == "torch":
        import torch

        return {k: torch.from_numpy(np.ascontiguousarray(v)) if v.dtype != object else v for k, v in dense.items()}
    if backend == "tensorflow":
        import tensorflow as tf

        return {k: tf.convert_to_tensor(v) if v.dtype != object else v for k, v in dense.items()}
    import jax.numpy as jnp

    return {k: jnp.asarray(v) if v.dtype != object else v for k, v in dense.items()}


def tensor_stream(
    frame,
    batch_rows: int,
    columns: list[str] | None = None,
    backend: str = "numpy",
    shuffle: bool = False,
    seed: int | None = None,
    shard_rank: int | None = None,
    world_size: int | None = None,
    drop_last: bool = True,
) -> Iterator[dict[str, Any]]:
    """Stream a SparkFrame/DataFrame as framework-ready tensor batches.

    Composes the chunk feed (stream.py: deterministic sharding, seeded
    shuffle, exact batch_rows) with per-chunk tensor conversion. The column
    projection happens in Spark (columns pruned at the scan), not after
    transfer.
    """
    from bears_spark.frame import SparkFrame
    from bears_spark.stream import stream_frame

    df = frame.df if isinstance(frame, SparkFrame) else frame
    if columns:
        df = df.select(*columns)
    for chunk in stream_frame(
        df,
        num_rows=batch_rows,
        stream_as="dict",
        shuffle=shuffle,
        seed=seed,
        shard_rank=shard_rank,
        world_size=world_size,
        drop_last=drop_last,
    ):
        yield as_tensors(chunk, backend=backend)
