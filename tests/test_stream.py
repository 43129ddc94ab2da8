"""Chunked feed surface tests (stream/shard/split — ScalableDataFrame.stream parity)."""

import pandas as pd
import pytest

from bears_spark.frame import SparkFrame
from bears_spark.stream import map_distributed, shard, split_named, stream_frame


@pytest.fixture()
def sf(spark):
    return SparkFrame.of(pd.DataFrame({"id": range(100), "v": [i * 0.5 for i in range(100)]}), spark)


def test_stream_num_rows_exact(sf):
    chunks = list(stream_frame(sf, num_rows=32))
    assert [len(c) for c in chunks] == [32, 32, 32, 4]


def test_stream_drop_last(sf):
    chunks = list(stream_frame(sf, num_rows=32, drop_last=True))
    assert [len(c) for c in chunks] == [32, 32, 32]


def test_stream_num_chunks(sf):
    chunks = list(stream_frame(sf, num_chunks=4))
    assert sum(len(c) for c in chunks) == 100
    assert len(chunks) == 4


def test_stream_validation(sf):
    with pytest.raises(ValueError):
        list(stream_frame(sf, num_rows=10, num_chunks=2))
    with pytest.raises(ValueError):
        list(stream_frame(sf))


def test_stream_as_layouts(sf):
    d = next(stream_frame(sf, num_rows=10, stream_as="dict"))
    assert set(d) == {"id", "v"} and len(d["id"]) == 10
    lod = next(stream_frame(sf, num_rows=3, stream_as="list_of_dict"))
    assert isinstance(lod, list) and isinstance(lod[0], dict)


def test_stream_shuffle_deterministic(sf):
    a = [c["id"].tolist() for c in stream_frame(sf, num_rows=50, shuffle=True, seed=7)]
    b = [c["id"].tolist() for c in stream_frame(sf, num_rows=50, shuffle=True, seed=7)]
    assert a == b
    assert a[0] != sorted(a[0])  # actually shuffled


def test_stream_map(sf):
    chunks = list(stream_frame(sf, num_rows=50, map=lambda pdf: pdf.assign(v2=pdf["v"] * 2)))
    assert "v2" in chunks[0].columns


def test_shard_partition_complete(sf):
    shards = [shard(sf.df, r, 4, id_col="id") for r in range(4)]
    counts = [s.count() for s in shards]
    assert sum(counts) == 100 and all(c == 25 for c in counts)
    # disjoint
    ids = set()
    for s in shards:
        got = {r["id"] for r in s.select("id").collect()}
        assert not (ids & got)
        ids |= got


def test_shard_rank_validation(sf):
    with pytest.raises(ValueError):
        shard(sf.df, 4, 4)


def test_stream_sharded(sf):
    total = 0
    for rank in range(4):
        for chunk in stream_frame(sf, num_rows=10, shard_rank=rank, world_size=4):
            total += len(chunk)
    assert total == 100


def test_map_distributed(sf):
    out = map_distributed(sf, lambda pdf: pdf.assign(v=pdf["v"] + 1), "id long, v double")
    assert out.df.agg({"v": "min"}).first()[0] == 1.0


def test_split_named(sf):
    parts = split_named(sf, 4)
    assert sorted(parts) == ["part-0", "part-1", "part-2", "part-3"]
    assert sum(p.count() for p in parts.values()) == 100


def test_frame_iterable_no_torch(sf):
    from bears_spark.torch_bridge import FrameIterable

    it = FrameIterable(sf, batch_rows=32, drop_last=True, stream_as="dict")
    batches = list(it)
    assert len(batches) == 3  # 100 rows -> 3 full batches of 32
    assert all(len(b["id"]) == 32 for b in batches)
    # transform hook
    it2 = FrameIterable(sf, batch_rows=50, drop_last=False, transform=lambda d: len(d["id"]))
    assert list(it2) == [50, 50]


# --------------------------------------------------------------------------
# tensor bridge (tensor_bridge.py)


def test_tensor_stream_numpy_backend(spark, sf_dir):
    import numpy as np

    from bears_spark.tensor_bridge import tensor_stream

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batches = list(tensor_stream(df, batch_rows=64, columns=["vec_id", "embedding"]))
    assert all(set(b) == {"vec_id", "embedding"} for b in batches)
    total = sum(len(b["vec_id"]) for b in batches)
    assert total > 0 and total % 64 == 0  # drop_last=True
    v = batches[0]["embedding"]
    assert isinstance(v, np.ndarray) and v.ndim == 2 and v.dtype == np.float32


def test_as_tensors_stacks_and_gates():
    import numpy as np
    import pytest as _pytest

    from bears_spark.tensor_bridge import as_tensors

    chunk = {
        "x": np.array([1.0, 2.0]),
        "vec": np.array([np.array([1.0, 2.0]), np.array([3.0, 4.0])], dtype=object),
    }
    out = as_tensors(chunk, backend="numpy")
    assert out["vec"].shape == (2, 2) and out["x"].shape == (2,)
    with _pytest.raises(ValueError):
        as_tensors(chunk, backend="paddle")
    for absent in ("torch", "tensorflow", "jax"):
        try:
            __import__(absent if absent != "jax" else "jax.numpy")
        except ImportError:
            with _pytest.raises(ImportError):
                as_tensors(chunk, backend=absent)


def test_frame_iterable_tensor_backend(spark, sf_dir):
    import numpy as np

    from bears_spark.frame import SparkFrame
    from bears_spark.torch_bridge import FrameIterable

    sf = SparkFrame(spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding"))
    it = FrameIterable(sf, batch_rows=32, tensor_backend="numpy")
    chunk = next(iter(it))
    assert isinstance(chunk["embedding"], np.ndarray) and chunk["embedding"].ndim == 2
