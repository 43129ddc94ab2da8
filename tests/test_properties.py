"""Property-based tests (hypothesis): randomized equivalence of the
trickiest ordered operators against pandas reference implementations.

Few examples per property (Spark jobs are ~100ms each); the value is the
randomized shapes — empty sides, all-one-key, interleaved timestamps —
not the example count.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bears_spark.frame import SparkFrame
from bears_spark.functions.temporal import asof_join

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_keys = st.integers(min_value=1, max_value=3)
_ts = st.integers(min_value=0, max_value=50)
_val = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


@st.composite
def _asof_case(draw):
    left = draw(st.lists(st.tuples(_keys, _ts), min_size=1, max_size=25))
    # unique (key, ts) on the right: duplicate right timestamps are
    # documented as unspecified-winner in both pandas and asof_join
    right_pairs = draw(st.lists(st.tuples(_keys, _ts), min_size=0, max_size=25, unique=True))
    right_vals = draw(st.lists(_val, min_size=len(right_pairs), max_size=len(right_pairs)))
    return left, [(k, t, v) for (k, t), v in zip(right_pairs, right_vals)]


@given(_asof_case())
@_settings
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    lpdf = pd.DataFrame(left_rows, columns=["k", "ts"])
    lpdf["ts"] = pd.to_datetime(lpdf["ts"], unit="m")
    lpdf["rid"] = range(len(lpdf))
    rpdf = pd.DataFrame(right_rows, columns=["k", "ts", "v"]) if right_rows else pd.DataFrame(
        {"k": pd.Series(dtype="int64"), "ts": pd.Series(dtype="int64"), "v": pd.Series(dtype="float64")}
    )
    rpdf["ts"] = pd.to_datetime(rpdf["ts"], unit="m")

    expected = pd.merge_asof(
        lpdf.sort_values(["ts", "rid"]), rpdf.sort_values("ts"), on="ts", by="k", direction="backward"
    ).set_index("rid")["v"]

    rdf = spark.createDataFrame(rpdf, schema="k bigint, ts timestamp, v double")
    out = asof_join(
        spark.createDataFrame(lpdf), rdf, on="ts", by="k", suffix="_a"
    ).toPandas().set_index("rid")["v_a"]

    for rid in lpdf["rid"]:
        e, o = expected.loc[rid], out.loc[rid]
        assert (pd.isna(e) and pd.isna(o)) or e == pytest.approx(o)


@st.composite
def _rolling_case(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    vals = draw(st.lists(_val, min_size=n, max_size=n))
    groups = draw(st.lists(st.integers(min_value=0, max_value=2), min_size=n, max_size=n))
    window = draw(st.integers(min_value=1, max_value=6))
    return vals, groups, window


@given(_rolling_case())
@_settings
def test_rolling_matches_pandas(spark, case):
    vals, groups, window = case
    pdf = pd.DataFrame({"t": range(len(vals)), "g": groups, "v": vals})
    sf = SparkFrame.of(pdf, spark)
    out = (
        sf.rolling_agg("t", window, {"v": ["mean", "min"]}, partition_by=["g"])
        .sort_values("t")
        .to_pandas()
    )
    roll = pdf.groupby("g")["v"].rolling(window, min_periods=1)
    exp_mean = roll.mean().reset_index(level=0, drop=True).sort_index()
    exp_min = roll.min().reset_index(level=0, drop=True).sort_index()
    assert out["v_rolling_mean"].tolist() == pytest.approx(exp_mean.tolist())
    assert out["v_rolling_min"].tolist() == pytest.approx(exp_min.tolist())


@st.composite
def _cumsum_case(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    vals = draw(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=n, max_size=n))
    parts = draw(st.integers(min_value=1, max_value=6))
    return vals, parts


@given(_cumsum_case())
@_settings
def test_partitioned_cumsum_matches_pandas(spark, case):
    from bears_spark.functions.prefix import partitioned_cumsum

    vals, parts = case
    pdf = pd.DataFrame({"id": range(len(vals)), "v": vals})
    if pdf.empty:
        df = spark.createDataFrame([], "id long, v long")
    else:
        df = spark.createDataFrame(pdf)
    out = partitioned_cumsum(df, ["id"], ["v"], num_partitions=parts)
    got = {r["id"]: r["v_cumsum"] for r in out.collect()}
    exp = pdf["v"].cumsum()
    assert got == {i: int(exp.iloc[i]) for i in range(len(vals))}


@st.composite
def _jpeg_case(draw):
    h = draw(st.integers(min_value=1, max_value=24))
    w = draw(st.integers(min_value=1, max_value=24))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return h, w, seed


@given(_jpeg_case())
@_settings
def test_jpeg_roundtrip_bounded_error(case):
    import numpy as np

    from bears_spark.functions.jpeg import decode_jpeg, encode_jpeg, encode_jpeg_progressive

    h, w, seed = case
    rng = np.random.RandomState(seed)
    # smooth-ish image: random low-frequency gradient (JPEG's design center)
    base = rng.randint(0, 256, size=(2, 2, 3))
    yy = np.linspace(0, 1, h)[:, None, None]
    xx = np.linspace(0, 1, w)[None, :, None]
    img = (base[0, 0] * (1 - yy) * (1 - xx) + base[0, 1] * (1 - yy) * xx
           + base[1, 0] * yy * (1 - xx) + base[1, 1] * yy * xx).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 6.0
    # progressive carries the same quantized coefficients -> identical decode
    assert (decode_jpeg(encode_jpeg_progressive(img, quality=95)) == dec).all()


@st.composite
def _asof_dir_case(draw):
    left = draw(st.lists(st.tuples(_keys, _ts), min_size=1, max_size=20))
    right_pairs = draw(st.lists(st.tuples(_keys, _ts), min_size=0, max_size=20, unique=True))
    right_vals = draw(st.lists(_val, min_size=len(right_pairs), max_size=len(right_pairs)))
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    exact = draw(st.booleans())
    return left, [(k, t, v) for (k, t), v in zip(right_pairs, right_vals)], direction, exact


@given(_asof_dir_case())
@_settings
def test_asof_directions_match_pandas(spark, case):
    from bears_spark.functions.temporal import asof_join

    left_rows, right_rows, direction, exact = case
    lpdf = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values(["t", "k"]).reset_index(drop=True)
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values(["t", "k"]).reset_index(drop=True)
    rpdf = rpdf.astype({"k": "int64", "t": "int64", "v": "float64"})
    ldf = spark.createDataFrame(lpdf)
    rdf = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "k bigint, t bigint, v float")
    )
    got = (
        asof_join(ldf, rdf, on="t", by="k", direction=direction, allow_exact_matches=exact)
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("t"),
        rpdf.sort_values("t"),
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
    ).sort_values(["k", "t"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for (_, g), (_, e) in zip(got.iterrows(), exp.iterrows()):
        gv, ev = g["v_asof"], e["v"]
        if pd.isna(ev):
            assert pd.isna(gv), (g, e)
        else:
            assert gv == pytest.approx(ev), (g, e)


# --------------------------------------------------------------------------
# MERGE INTO vs a pandas reference model


@st.composite
def _merge_case(draw):
    keys = st.integers(min_value=0, max_value=8)
    vals = st.integers(min_value=-100, max_value=100)
    target = draw(st.dictionaries(keys, vals, min_size=0, max_size=6))
    source = draw(st.dictionaries(keys, vals, min_size=0, max_size=6))
    wm = draw(st.sampled_from(["update", "keep", "delete"]))
    wnm = draw(st.sampled_from(["insert", "ignore"]))
    wnmbs = draw(st.sampled_from(["keep", "delete"]))
    return target, source, wm, wnm, wnmbs


def _merge_model(target: dict, source: dict, wm: str, wnm: str, wnmbs: str) -> dict:
    out = {}
    for k, v in target.items():
        if k in source:
            if wm == "update":
                out[k] = source[k]
            elif wm == "keep":
                out[k] = v
            # delete: drop
        else:
            if wnmbs == "keep":
                out[k] = v
    for k, v in source.items():
        if k not in target and wnm == "insert":
            out[k] = v
    return out


@given(_merge_case())
@_settings
def test_merge_into_matches_model(spark, case):
    from bears_spark.functions.cdc import merge_into

    target, source, wm, wnm, wnmbs = case
    t = spark.createDataFrame(list(target.items()) or [(None, None)], "k: bigint, v: bigint").where(
        F.col("k").isNotNull()
    )
    s = spark.createDataFrame(list(source.items()) or [(None, None)], "k: bigint, v: bigint").where(
        F.col("k").isNotNull()
    )
    got = {
        r["k"]: r["v"]
        for r in merge_into(
            t, s, on="k", when_matched=wm, when_not_matched=wnm, when_not_matched_by_source=wnmbs
        ).collect()
    }
    assert got == _merge_model(target, source, wm, wnm, wnmbs)


# ----------------------------------------------------------------------------
# cusum_scores closed-form scan == textbook sequential recursion, on arbitrary
# float sequences (negatives, repeats, constant runs).
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=40,
    )
)
@_settings
def test_cusum_closed_form_equals_recursion(spark, vals):
    import math

    from bears_spark.functions.analytics import cusum_scores

    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)], "seq: bigint, grp: string, value: double"
    )
    got = {r["seq"]: r["cusum"] for r in cusum_scores(df, "value", ["seq"], ["grp"], k=0.5).collect()}
    n = len(vals)
    mu = sum(vals) / n
    var = sum((v - mu) ** 2 for v in vals) / (n - 1)
    sd = math.sqrt(var)
    s = 0.0
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - mu - 0.5 * sd))
        assert math.isclose(got[i], s, rel_tol=1e-9, abs_tol=1e-6)


# ----------------------------------------------------------------------------
# tfidf_cosine_pairs == pure-python reference on random small corpora
# (unigram terms, no df cap in range): weights tf*ln(n/df), norms over all
# terms, dot over shared terms.
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=8),
        min_size=2,
        max_size=5,
    )
)
@_settings
def test_tfidf_cosine_matches_python_reference(spark, docs_words):
    import math
    from collections import Counter
    from itertools import combinations

    from bears_spark.functions.similarity import tfidf_cosine_pairs

    docs = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    sdf = spark.createDataFrame(docs, "doc_id: bigint, text: string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(sdf, "doc_id", "text", ngram_n=1, threshold=0.0).collect()
    }

    n = len(docs)
    tfs = [Counter(ws) for ws in docs_words]
    df = Counter(w for tf in tfs for w in tf)
    wts = [{w: c * math.log(n / df[w]) for w, c in tf.items()} for tf in tfs]
    expected = {}
    for i, j in combinations(range(n), 2):
        shared = set(wts[i]) & set(wts[j])
        if not shared:
            continue
        dot = sum(wts[i][w] * wts[j][w] for w in shared)
        na = math.sqrt(sum(v * v for v in wts[i].values()))
        nb = math.sqrt(sum(v * v for v in wts[j].values()))
        if na == 0 or nb == 0:
            continue  # all-shared-vocab doc (every idf 0): no defined angle
        cos = dot / (na * nb)
        if round(cos, 6) >= 0.0:
            expected[(i, j)] = round(cos, 6)
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], abs=2e-6)


# ---------------------------------------------------------------------------
# chunking invariants (functions/text.py chunk_documents)


@st.composite
def _chunk_case(draw):
    n_tokens = draw(st.integers(min_value=0, max_value=120))
    chunk = draw(st.integers(min_value=2, max_value=40))
    overlap = draw(st.integers(min_value=0, max_value=chunk - 1))
    return n_tokens, chunk, overlap


@given(_chunk_case())
@_settings
def test_chunk_documents_invariants(spark, case):
    """For any (doc length, chunk size, overlap): chunks reconstruct the
    document exactly (concatenating each chunk's non-overlapping tail),
    starts advance by step, no chunk is empty, and token counts match."""
    from bears_spark.functions.text import chunk_documents

    n_tokens, chunk, overlap = case
    step = chunk - overlap
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id int, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    if n_tokens == 0:
        assert rows == []
        return
    assert rows[0]["chunk_start"] == 0
    rebuilt = rows[0]["chunk_text"].split()
    for prev, cur in zip(rows, rows[1:]):
        assert cur["chunk_start"] == prev["chunk_start"] + step * (cur["chunk_id"] - prev["chunk_id"])
        rebuilt.extend(cur["chunk_text"].split()[overlap:])
    assert rebuilt == toks  # lossless cover, order preserved
    for r in rows:
        got = r["chunk_text"].split()
        assert 0 < len(got) <= chunk and len(got) == r["n_tokens"]
        assert got == toks[r["chunk_start"] : r["chunk_start"] + chunk]


# ---------------------------------------------------------------------------
# int8 scalar quantization error bound (functions/vectors.py)


@st.composite
def _quant_case(draw):
    dim = draw(st.integers(min_value=1, max_value=6))
    n = draw(st.integers(min_value=1, max_value=12))
    vals = draw(
        st.lists(
            st.lists(
                st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
                min_size=dim,
                max_size=dim,
            ),
            min_size=n,
            max_size=n,
        )
    )
    return vals


@given(_quant_case())
@_settings
def test_scalar_quantization_error_bound(spark, case):
    """Reconstruction error of every in-fit vector is within half a
    quantization step per dimension, for arbitrary float32 corpora."""
    from bears_spark.functions.vectors import (
        fit_scalar_quantization,
        scalar_dequantize_expr,
        scalar_quantize_expr,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(case)], "vec_id int, v array<float>"
    )
    mins, maxs = fit_scalar_quantization(df, "v")
    out = df.select(
        "v",
        scalar_dequantize_expr(scalar_quantize_expr("v", mins, maxs), mins, maxs).alias("r"),
    ).collect()
    import numpy as np

    for row in out:
        for d, (x, r) in enumerate(zip(row["v"], row["r"])):
            step = (maxs[d] - mins[d]) / 255.0
            # float32 storage rounds x itself; compare against the stored value
            assert abs(np.float32(x) - r) <= step / 2 + 1e-9 * max(1.0, abs(x))


@st.composite
def _ranked_case(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    # duplicate-heavy values exercise min/dense tie handling; include nulls
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
            min_size=n,
            max_size=n,
        )
    )
    parts = draw(st.integers(min_value=1, max_value=6))
    nb = draw(st.integers(min_value=1, max_value=9))
    return vals, parts, nb


@given(_ranked_case())
@_settings
def test_distributed_rank_ntile_shift_match_window(spark, case):
    """The scale-safe partition-less machinery (VERDICT r5 #8) is
    value-identical to the one-task window forms it replaced, on randomized
    duplicate-heavy null-bearing frames."""
    from pyspark.sql import Window

    from bears_spark.functions.prefix import (
        distributed_rank,
        global_shift,
        partitioned_ntile,
        release_scan_caches,
    )

    vals, parts, nb = case
    pdf = pd.DataFrame({"id": range(len(vals)), "v": pd.array(vals, dtype="Int64")})
    if pdf.empty:
        df = spark.createDataFrame([], "id long, v long")
    else:
        df = spark.createDataFrame(pdf)

    for method, wfn in (("min", F.rank), ("dense", F.dense_rank)):
        got = distributed_rank(df, "v", method=method, out_col="r", num_partitions=parts)
        exp = df.withColumn("r2", wfn().over(Window.orderBy(F.asc("v"))))
        bad = got.join(exp.select("id", "r2"), "id").filter(F.col("r") != F.col("r2"))
        assert bad.count() == 0, (method, parts)

    tiled = partitioned_ntile(df, ["v", "id"], nb, out_col="b", num_partitions=parts)
    exp_t = df.withColumn("b2", F.ntile(nb).over(Window.orderBy("v", "id")))
    bad_t = tiled.join(exp_t.select("id", "b2"), "id").filter(F.col("b") != F.col("b2"))
    assert bad_t.count() == 0

    sh = global_shift(df, ["id"], ["v"], periods=1, num_partitions=parts)
    exp_s = df.withColumn("v_shift2", F.lag("v", 1).over(Window.orderBy("id")))
    bad_s = (
        sh.join(exp_s.select("id", "v_shift2"), "id")
        .filter(~(F.col("v_shift").eqNullSafe(F.col("v_shift2"))))
    )
    assert bad_s.count() == 0
    release_scan_caches()


@st.composite
def _fill_case(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.floats(min_value=-9, max_value=9, allow_nan=False, width=32)),
            min_size=n,
            max_size=n,
        )
    )
    parts = draw(st.integers(min_value=1, max_value=6))
    return vals, parts


@given(_fill_case())
@_settings
def test_partitioned_fill_matches_pandas(spark, case):
    from bears_spark.functions.prefix import partitioned_fill, release_scan_caches

    vals, parts = case
    pdf = pd.DataFrame({"id": range(len(vals)), "v": vals})
    if pdf.empty:
        df = spark.createDataFrame([], "id long, v double")
    else:
        df = spark.createDataFrame(pdf.astype({"v": "float64"}))
    out = partitioned_fill(df, ["id"], ["v"], num_partitions=parts)
    got = {r["id"]: r["v"] for r in out.collect()}
    exp = pdf["v"].astype("float64").ffill()
    for i in range(len(vals)):
        e = exp.iloc[i]
        if pd.isna(e):
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(e)
    # reversed order == bfill
    back = partitioned_fill(df, [F.desc("id")], ["v"], num_partitions=parts)
    gotb = {r["id"]: r["v"] for r in back.collect()}
    expb = pdf["v"].astype("float64").bfill()
    for i in range(len(vals)):
        e = expb.iloc[i]
        if pd.isna(e):
            assert gotb[i] is None
        else:
            assert gotb[i] == pytest.approx(e)
    release_scan_caches()


@st.composite
def _pack_case(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    toks = draw(st.lists(st.integers(min_value=0, max_value=30), min_size=n, max_size=n))
    budget = draw(st.integers(min_value=1, max_value=17))
    return toks, budget


@given(_pack_case())
@_settings
def test_sequence_packing_model(spark, case):
    """Concat-and-chunk packing invariants on random token counts: packs
    are exactly `budget` tokens except the last, spans partition each doc,
    and the reconstruction in (pack, doc) order is the doc_id order."""
    from bears_spark.functions.prefix import partitioned_cumsum, release_scan_caches

    toks, budget = case
    pdf = pd.DataFrame({"doc_id": range(len(toks)), "n_tok": toks})
    nz = pdf[pdf["n_tok"] > 0]
    df = spark.createDataFrame(pdf).filter(F.col("n_tok") > 0)
    if nz.empty:
        release_scan_caches()
        return
    b = F.lit(budget).cast("bigint")
    cum = partitioned_cumsum(df, ["doc_id"], ["n_tok"], num_partitions=3, suffix="_cum")
    start = F.col("n_tok_cum") - F.col("n_tok")
    out = (
        cum.select(
            "doc_id",
            start.alias("s"),
            F.col("n_tok_cum").alias("e"),
            F.explode(
                F.sequence(F.floor(start / b).cast("bigint"), F.floor((F.col("n_tok_cum") - 1) / b).cast("bigint"))
            ).alias("p"),
        )
        .select(
            "p",
            "doc_id",
            (F.least(F.col("e"), (F.col("p") + 1) * b) - F.greatest(F.col("s"), F.col("p") * b)).alias("n"),
        )
        .collect()
    )
    total = int(nz["n_tok"].sum())
    per_pack: dict = {}
    per_doc: dict = {}
    for r in out:
        per_pack[r["p"]] = per_pack.get(r["p"], 0) + r["n"]
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n"]
        assert r["n"] > 0
    last = max(per_pack)
    assert set(per_pack) == set(range(last + 1))  # no empty packs
    for p, n in per_pack.items():
        assert n == budget if p != last else 0 < n <= budget
    assert per_doc == {int(d): int(t) for d, t in zip(nz["doc_id"], nz["n_tok"])}
    assert sum(per_pack.values()) == total
    release_scan_caches()


@st.composite
def _avro_case(draw):
    prim = st.sampled_from(["int", "long", "string", "boolean", "double", "bytes"])

    def value_for(t):
        return {
            "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "long": st.integers(min_value=-(2**62), max_value=2**62 - 1),
            "string": st.text(max_size=12),
            "boolean": st.booleans(),
            "double": st.floats(allow_nan=False, allow_infinity=False, width=64),
            "bytes": st.binary(max_size=8),
        }[t]

    n_fields = draw(st.integers(min_value=1, max_value=5))
    fields = []
    field_strats = {}
    for i in range(n_fields):
        t = draw(prim)
        kind = draw(st.sampled_from(["plain", "nullable", "array", "map"]))
        name = f"f{i}"
        if kind == "plain":
            fields.append({"name": name, "type": t})
            field_strats[name] = value_for(t)
        elif kind == "nullable":
            fields.append({"name": name, "type": ["null", t]})
            field_strats[name] = st.one_of(st.none(), value_for(t))
        elif kind == "array":
            fields.append({"name": name, "type": {"type": "array", "items": t}})
            field_strats[name] = st.lists(value_for(t), max_size=4)
        else:
            fields.append({"name": name, "type": {"type": "map", "values": t}})
            field_strats[name] = st.dictionaries(st.text(max_size=5), value_for(t), max_size=3)
    # one nested record field exercising recursion
    fields.append(
        {"name": "nest", "type": {"type": "record", "name": "inner",
                                  "fields": [{"name": "a", "type": "long"},
                                             {"name": "b", "type": ["null", "string"]}]}}
    )
    field_strats["nest"] = st.fixed_dictionaries(
        {"a": st.integers(min_value=-100, max_value=100), "b": st.one_of(st.none(), st.text(max_size=6))}
    )
    schema = {"type": "record", "name": "row", "fields": fields}
    records = draw(st.lists(st.fixed_dictionaries(field_strats), min_size=0, max_size=6))
    return schema, records


@given(_avro_case())
@_settings
def test_avro_generic_roundtrip_random(case):
    """write_container/read_container are inverse over randomized schemas:
    primitives, nullable unions, arrays, maps, nested records."""
    from bears_spark.io.avro_generic import read_container, write_container

    schema, records = case
    _, back = read_container(write_container(schema, records))
    assert back == records


@st.composite
def _roaring_case(draw):
    # mix dense runs (bitset/run-container territory), sparse values, and
    # multi-bucket uint64s so every container kind gets exercised
    base = draw(st.lists(st.integers(min_value=0, max_value=1 << 40), max_size=40))
    start = draw(st.integers(min_value=0, max_value=1 << 20))
    run = list(range(start, start + draw(st.integers(min_value=0, max_value=5000))))
    return base + run


@given(_roaring_case())
@_settings
def test_roaring_rba_roundtrip_random(vals):
    """serialize_rba/deserialize_rba are inverse over randomized 64-bit sets
    spanning array, bitset and multi-bucket shapes."""
    from bears_spark.io.roaring import deserialize_rba, serialize_rba

    assert deserialize_rba(serialize_rba(vals)) == sorted(set(vals))


@given(st.binary(max_size=64).filter(lambda b: len(b) % 4 == 0))
@_settings
def test_z85_roundtrip_random(blob):
    from bears_spark.io.roaring import z85_decode, z85_encode

    assert z85_decode(z85_encode(blob)) == blob


@st.composite
def _global_rolling_case(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.floats(min_value=-50, max_value=50, allow_nan=False)),
            min_size=n,
            max_size=n,
        )
    )
    if all(v is None for v in vals):
        vals[0] = 0.0  # an all-null column infers as void, not double
    window = draw(st.integers(min_value=1, max_value=8))
    # pandas requires min_periods <= window
    min_periods = draw(st.integers(min_value=1, max_value=min(3, window)))
    return vals, window, min_periods


@given(_global_rolling_case())
@_settings
def test_global_rolling_matches_pandas(spark, case):
    """Partition-less rolling_agg (prefix.global_rolling) equals the pandas
    rolling reference across random lengths, nulls, windows and min_periods
    — the carry-k machinery can't diverge at batch/partition boundaries."""
    vals, window, min_periods = case
    pdf = pd.DataFrame({"t": range(len(vals)), "v": vals})
    sf = SparkFrame.of(pdf, spark)
    out = (
        sf.rolling_agg("t", window, {"v": ["mean", "sum"]}, min_periods=min_periods)
        .sort_values("t")
        .to_pandas()
    )
    roll = pdf["v"].rolling(window, min_periods=min_periods)
    for col, exp in (("v_rolling_mean", roll.mean()), ("v_rolling_sum", roll.sum())):
        got = out[col]
        for i in range(len(vals)):
            if pd.isna(exp.iloc[i]):
                assert pd.isna(got.iloc[i]), (col, i, got.iloc[i])
            else:
                assert float(got.iloc[i]) == pytest.approx(float(exp.iloc[i])), (col, i)
    from bears_spark.functions.prefix import release_scan_caches

    release_scan_caches()


@st.composite
def _time_rolling_case(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    # second offsets with duplicates allowed (same-timestamp rows share a window)
    offs = draw(st.lists(st.integers(min_value=0, max_value=300), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.floats(min_value=-20, max_value=20, allow_nan=False)),
            min_size=n,
            max_size=n,
        )
    )
    if all(v is None for v in vals):
        vals[0] = 1.0
    groups = draw(st.lists(st.integers(min_value=0, max_value=2), min_size=n, max_size=n))
    dur = draw(st.integers(min_value=1, max_value=120))
    return offs, vals, groups, dur


@given(_time_rolling_case())
@_settings
def test_rolling_time_agg_matches_bruteforce(spark, case):
    """rolling_time_agg equals a brute-force closed-interval [t-d, t]
    reference over random timestamps (with duplicates), groups and nulls."""
    import datetime

    offs, vals, groups, dur = case
    base = datetime.datetime(2024, 3, 1)
    pdf = pd.DataFrame(
        {
            "i": range(len(offs)),
            "g": groups,
            "ts": [base + datetime.timedelta(seconds=o) for o in offs],
            "v": vals,
        }
    )
    sf = SparkFrame.of(pdf, spark)
    out = (
        sf.rolling_time_agg("ts", dur, {"v": ["sum", "count"]}, partition_by=["g"])
        .sort_values("i")
        .to_pandas()
        .reset_index(drop=True)
    )
    for idx, row in pdf.iterrows():
        in_win = pdf[
            (pdf["g"] == row["g"])
            & (pdf["ts"] >= row["ts"] - datetime.timedelta(seconds=dur))
            & (pdf["ts"] <= row["ts"])
        ]["v"].dropna()
        got = out.loc[out["i"] == row["i"]].iloc[0]
        assert int(got["v_rolling_count"]) == len(in_win), (idx, dur)
        if len(in_win):
            assert float(got["v_rolling_sum"]) == pytest.approx(in_win.sum()), (idx, dur)
        else:
            assert pd.isna(got["v_rolling_sum"])


# -- lakehouse row-level deletes vs a pandas reference (VERDICT r7 #8) -------

_lakehouse_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def _dv_delete_case(draw):
    """Random Delta table shape: 1-3 files, each with a row count and a
    (possibly empty) positional delete set."""
    nfiles = draw(st.integers(min_value=1, max_value=3))
    files = []
    for _ in range(nfiles):
        n = draw(st.integers(min_value=1, max_value=12))
        dels = draw(st.sets(st.integers(min_value=0, max_value=n - 1)))
        files.append((n, sorted(dels)))
    return files


@given(_dv_delete_case())
@_lakehouse_settings
def test_delta_deletion_vectors_match_model(spark, tmp_path, case):
    """Delta DV merge-on-read equals the brute-force model: for every file,
    exactly the rows at the flagged positions (write order) disappear —
    including all-deleted files, empty delete sets, and position 0/n-1
    boundaries hypothesis likes to find."""
    import json as _json
    import os
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bears_spark.io.delta_log import DeltaTableReader
    from bears_spark.io.roaring import serialize_rba, z85_encode

    root = str(tmp_path / f"dvprop-{_uuid.uuid4().hex[:8]}")
    os.makedirs(os.path.join(root, "_delta_log"))
    schema_str = _json.dumps({
        "type": "struct",
        "fields": [{"name": "id", "type": "long", "nullable": True, "metadata": {}}],
    })
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "p", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_str, "partitionColumns": [],
                      "configuration": {}}},
    ]
    expected = []
    base = 0
    for i, (n, dels) in enumerate(case):
        ids = list(range(base, base + n))
        base += n
        name = f"f{i}.parquet"
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}),
                       os.path.join(root, name))
        add = {"path": name, "partitionValues": {}, "size": 1,
               "modificationTime": 0, "dataChange": True}
        if dels:
            data = serialize_rba(dels)
            pad = (-len(data)) % 4
            add["deletionVector"] = {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
                "sizeInBytes": len(data), "cardinality": len(dels),
            }
        actions.append({"add": add})
        expected.extend(v for pos, v in enumerate(ids) if pos not in dels)
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(_json.dumps(a) + "\n")
    got = sorted(x["id"] for x in DeltaTableReader(spark, root).read().collect())
    assert got == sorted(expected)


_ICE_MANIFEST_V2 = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2v2",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int"}]},
            ],
        }},
    ],
}

_ICE_MLIST = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_ICE_LANGS = ["en", "de", "fr", None]


@st.composite
def _iceberg_delete_case(draw):
    """Random Iceberg v2 shape: 1-3 data files with per-file sequence
    numbers and (id, lang) rows; random positional deletes; random equality
    deletes on lang with their own sequence numbers (the strictly-below
    gating rule is exactly the off-by-one this hunts)."""
    nfiles = draw(st.integers(min_value=1, max_value=3))
    files = []
    for _ in range(nfiles):
        n = draw(st.integers(min_value=1, max_value=8))
        langs = draw(st.lists(st.sampled_from(_ICE_LANGS), min_size=n, max_size=n))
        seq = draw(st.integers(min_value=1, max_value=3))
        dels = draw(st.sets(st.integers(min_value=0, max_value=n - 1)))
        files.append((n, langs, seq, sorted(dels)))
    eq_dels = draw(st.lists(
        st.tuples(st.sampled_from(_ICE_LANGS), st.integers(min_value=1, max_value=3)),
        max_size=3,
    ))
    return files, eq_dels


@given(_iceberg_delete_case())
@_lakehouse_settings
def test_iceberg_v2_deletes_match_model(spark, tmp_path, case):
    """Iceberg positional + equality merge-on-read equals the brute-force
    model: a row survives iff its position isn't deleted AND no equality
    delete matches its key with a sequence number STRICTLY above the data
    file's (null keys match null, per eqNullSafe semantics)."""
    import json as _json
    import os
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bears_spark.io.avro_generic import write_container
    from bears_spark.io.iceberg_log import IcebergTableReader

    files, eq_dels = case
    root = str(tmp_path / f"iceprop-{_uuid.uuid4().hex[:8]}")
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))

    entries = []
    expected = []
    pos_del_rows = []
    base = 0
    for i, (n, langs, seq, dels) in enumerate(files):
        ids = list(range(base, base + n))
        base += n
        fp = os.path.join(root, "data", f"f{i}.parquet")
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                                 "lang": pa.array(langs, pa.string())}), fp)
        entries.append((1, 0, fp, seq, None))
        pos_del_rows.extend((fp, p) for p in dels)
        for pos, (id_, lang) in enumerate(zip(ids, langs)):
            if pos in dels:
                continue
            if any(lang == dl and seq < dseq for dl, dseq in eq_dels):
                continue
            expected.append(id_)

    del_entries = []
    if pos_del_rows:
        pdf = os.path.join(root, "data", "posdel.parquet")
        pq.write_table(pa.table({
            "file_path": pa.array([f for f, _ in pos_del_rows], pa.string()),
            "pos": pa.array([p for _, p in pos_del_rows], pa.int64()),
        }), pdf)
        # positional deletes apply regardless of sequence: give them max seq
        del_entries.append((1, 1, pdf, 3, None))
    for j, (dl, dseq) in enumerate(eq_dels):
        ep = os.path.join(root, "data", f"eqdel{j}.parquet")
        pq.write_table(pa.table({"lang": pa.array([dl], pa.string())}), ep)
        del_entries.append((1, 2, ep, dseq, (2,)))

    def _manifest(name, ents):
        p = os.path.join(root, "metadata", name)
        recs = [
            {"status": st_, "sequence_number": sq,
             "data_file": {"content": ct, "file_path": fp, "file_format": "PARQUET",
                           "record_count": 1,
                           "equality_ids": list(eq) if eq else None}}
            for st_, ct, fp, sq, eq in ents
        ]
        with open(p, "wb") as f:
            f.write(write_container(_ICE_MANIFEST_V2, recs))
        return p

    manifests = [(_manifest("mdat.avro", entries), 0)]
    if del_entries:
        manifests.append((_manifest("mdel.avro", del_entries), 1))
    ml = os.path.join(root, "metadata", "ml.avro")
    with open(ml, "wb") as f:
        f.write(write_container(_ICE_MLIST, [
            {"manifest_path": m, "manifest_length": 1, "content": c,
             "added_snapshot_id": 1}
            for m, c in manifests
        ]))
    meta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml,
                       "sequence-number": 3}],
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "lang", "required": False, "type": "string"},
        ]}],
        "current-schema-id": 0,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")

    got = sorted(x["id"] for x in IcebergTableReader(spark, root).read().collect())
    assert got == sorted(expected)


@st.composite
def _mor_sequence_case(draw):
    n = draw(st.integers(min_value=8, max_value=30))
    ops = draw(st.lists(
        st.tuples(st.sampled_from(["<", ">=", "=", "<=", ">"]),
                  st.integers(min_value=0, max_value=35)),
        min_size=1, max_size=3,
    ))
    files = draw(st.integers(min_value=1, max_value=3))
    return n, files, ops


@given(_mor_sequence_case())
@_lakehouse_settings
def test_snapshot_mor_delete_sequence_matches_model(spark, tmp_path, case):
    """A random sequence of merge-on-read deletes equals the brute-force
    model at EVERY version (DV merging across deletes, full-file drops,
    boundary predicates) — and time travel replays each intermediate
    state exactly."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from bears_spark.io.snapshot_table import SnapshotTable

    n, files, ops = case
    t = SnapshotTable(spark, str(tmp_path / f"morprop-{_uuid.uuid4().hex[:8]}"))
    t.overwrite(spark.range(0, n).select(F.col("id")).repartition(files))
    py_ops = {"<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
              ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
              "=": lambda a, b: a == b}
    live = set(range(n))
    states = [set(live)]
    for op, val in ops:
        t.delete_where("id", op, val, mode="mor")
        live = {i for i in live if not py_ops[op](i, val)}
        states.append(set(live))
    for v, want in enumerate(states, start=1):
        got = {x["id"] for x in t.read(version=v).collect()} if want else set()
        if not want:
            # an all-deleted table may legitimately have zero files
            entries = t.files(version=v)
            if entries:
                got = {x["id"] for x in t.read(version=v).collect()}
            assert got == set()
        else:
            assert got == want, (v, op, val)


@st.composite
def _export_churn_case(draw):
    # a random operation sequence over a small snapshot table; each step is
    # (op, lo, hi) with semantics in the test body
    steps = draw(st.lists(
        st.tuples(st.sampled_from(["append", "cow", "mor", "overwrite"]),
                  st.integers(min_value=0, max_value=60),
                  st.integers(min_value=1, max_value=25)),
        min_size=1, max_size=4,
    ))
    return steps


@given(_export_churn_case())
@_lakehouse_settings
def test_export_delta_continuous_matches_table_history(spark, tmp_path, case):
    """Random append/CoW-delete/MoR-delete/overwrite churn, exported
    incrementally after every commit: at each export generation the Delta
    reader must equal the table's live rows, and EVERY prior generation
    must still time-travel to its own state (diff commits, DV re-adds,
    checkpoint pointers)."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from bears_spark.io.delta_log import DeltaTableReader
    from bears_spark.io.snapshot_table import SnapshotTable

    tag = _uuid.uuid4().hex[:8]
    t = SnapshotTable(spark, str(tmp_path / f"churn-{tag}"))
    out = str(tmp_path / f"churn-{tag}-delta")
    t.overwrite(spark.range(0, 40).select(F.col("id")).repartition(2))
    live = set(range(40))
    from bears_spark.io.delta_log import export_delta_log

    export_delta_log(t, out, checkpoint=True)
    # per exported VERSION, the expected live set. A step whose file list is
    # unchanged (e.g. a no-match delete) exports NOTHING — no-op exports are
    # deliberately versionless (idempotent replication), so the history is
    # keyed by the exported log's actual latest version after each step.
    r0 = DeltaTableReader(spark, out)
    history = {r0.latest_version(): set(live)}
    nxt = 1000
    for op, lo, span in case:
        if op == "append":
            t.append(spark.range(nxt, nxt + span).select(F.col("id")).coalesce(1))
            live |= set(range(nxt, nxt + span))
            nxt += span
        elif op == "overwrite":
            t.overwrite(spark.range(lo, lo + span).select(F.col("id")).repartition(2))
            live = set(range(lo, lo + span))
        else:
            t.delete_where("id", "<", lo, mode=op if op == "mor" else "cow")
            live = {i for i in live if not i < lo}
        export_delta_log(t, out, checkpoint=True)
        history[DeltaTableReader(spark, out).latest_version()] = set(live)
    r = DeltaTableReader(spark, out)
    # versions advance exactly one per CHANGED export, never beyond
    assert r.latest_version() == max(history)
    assert set(history) == set(range(len(history)))
    for v, want in sorted(history.items()):
        got = {x["id"] for x in r.read(version=v).collect()}
        assert got == want, (v, case)


@st.composite
def _colmap_nested_case(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    ids = draw(st.lists(st.integers(min_value=-50, max_value=50), min_size=n, max_size=n))
    xs = draw(st.lists(st.integers(min_value=-9, max_value=9), min_size=n, max_size=n))
    ys = draw(st.lists(st.sampled_from(["a", "b", ""]), min_size=n, max_size=n))
    arr_lens = draw(st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n))
    mode = draw(st.sampled_from(["name", "id"]))
    return ids, xs, ys, arr_lens, mode


@given(_colmap_nested_case())
@_lakehouse_settings
def test_delta_column_mapping_nested_random(spark, tmp_path, case):
    """Randomized nested column mapping: struct AND array<struct> columns
    stored under physical names round-trip to logical names with values
    intact (the positional-cast rename must hold through containers)."""
    import json as _json
    import os
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bears_spark.io.delta_log import DeltaTableReader

    ids, xs, ys, arr_lens, mode = case
    root = str(tmp_path / f"cmrand-{_uuid.uuid4().hex[:8]}")
    os.makedirs(os.path.join(root, "_delta_log"))
    inner = pa.struct([("p-x", pa.int64()), ("p-y", pa.string())])
    arr_vals = [
        [{"p-q": j} for j in range(k)] for k in arr_lens
    ]
    pq.write_table(
        pa.table({
            "p-id": pa.array(ids, pa.int64()),
            "p-info": pa.array(
                [{"p-x": x, "p-y": y} for x, y in zip(xs, ys)], inner
            ),
            "p-arr": pa.array(arr_vals, pa.list_(pa.struct([("p-q", pa.int64())]))),
        }),
        os.path.join(root, "f0.parquet"),
    )

    def fld(name, typ, phys, cid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.id": cid,
                             "delta.columnMapping.physicalName": phys}}

    schema_str = _json.dumps({
        "type": "struct",
        "fields": [
            fld("id", "long", "p-id", 1),
            fld("info", {"type": "struct", "fields": [
                fld("x", "long", "p-x", 3), fld("y", "string", "p-y", 4),
            ]}, "p-info", 2),
            fld("arr", {"type": "array", "containsNull": True,
                        "elementType": {"type": "struct", "fields": [
                            fld("q", "long", "p-q", 6)]}}, "p-arr", 5),
        ],
    })
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "r", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_str, "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": mode}}},
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(_json.dumps(a) + "\n")
    out = DeltaTableReader(spark, root).read()
    assert out.columns == ["id", "info", "arr"]
    rows = sorted(
        out.collect(),
        key=lambda r: (r["id"], r["info"]["x"], r["info"]["y"], len(r["arr"])),
    )
    want = sorted(zip(ids, xs, ys, arr_lens))
    assert len(rows) == len(want)
    for r, (i, x, y, k) in zip(rows, want):
        assert (r["id"], r["info"]["x"], r["info"]["y"]) == (i, x, y)
        assert [el["q"] for el in r["arr"]] == list(range(k))


# ---------------------------------------------------------------------------
# Iceberg partition-transform pruning soundness: a rejected file may NEVER
# contain a matching row (pruning is an optimization, not a filter). Model:
# group random rows into "files" by their transform value exactly as a real
# Iceberg writer lays them out, then check _partition_reject against a
# brute-force row scan for random predicates.
@st.composite
def _transform_prune_case(draw):
    kind = draw(st.sampled_from(
        ["bucket_int", "truncate_int", "truncate_str", "time_ts", "time_date"]
    ))
    if kind == "truncate_str":
        rows = draw(st.lists(st.text(alphabet="abcxyz", min_size=0, max_size=6),
                             min_size=1, max_size=30))
        probe = draw(st.text(alphabet="abcxyz", min_size=0, max_size=6))
        param = draw(st.sampled_from([1, 2, 3]))
    elif kind == "time_ts":
        # raw microseconds-since-epoch, straddling 1970 so pre-epoch floor
        # semantics are exercised; param carries the sampled transform
        span = 4 * 366 * 86_400_000_000
        rows = draw(st.lists(st.integers(-span, span), min_size=1, max_size=30))
        probe = draw(st.integers(-span, span))
        param = draw(st.sampled_from(["year", "month", "day", "hour"]))
    elif kind == "time_date":
        rows = draw(st.lists(st.integers(-1500, 1500), min_size=1, max_size=30))
        probe = draw(st.integers(-1500, 1500))
        param = draw(st.sampled_from(["year", "month", "day"]))
    else:
        rows = draw(st.lists(st.integers(-1000, 1000), min_size=1, max_size=30))
        probe = draw(st.integers(-1000, 1000))
        param = draw(st.sampled_from([2, 4, 8] if kind == "bucket_int" else [1, 10, 100]))
    op = draw(st.sampled_from(["=", "<", "<=", ">", ">="]))
    return kind, rows, probe, param, op


@given(_transform_prune_case())
@settings(max_examples=200, deadline=None)
def test_iceberg_transform_pruning_sound(case):
    from bears_spark.io.iceberg_log import (
        IcebergTableReader,
        bucket_transform,
        time_transform,
        truncate_transform,
    )

    kind, rows, probe, param, op = case
    _ops = {"=": lambda a, b: a == b, "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b, ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b}
    if kind == "bucket_int":
        tkind, ice_type = "bucket", "long"
        tv = lambda r: bucket_transform(r, ice_type, param)
    elif kind in ("time_ts", "time_date"):
        tkind = param  # "year" / "month" / "day" / "hour"
        ice_type = "timestamp" if kind == "time_ts" else "date"
        tv = lambda r: time_transform(r, ice_type, param)
    else:
        tkind = "truncate"
        ice_type = "long" if kind == "truncate_int" else "string"
        tv = lambda r: truncate_transform(r, ice_type, param)
    files: dict = {}
    for r in rows:
        files.setdefault(tv(r), []).append(r)
    for pv, members in files.items():
        rejected = IcebergTableReader._partition_reject(
            {"partition": {"p": pv}}, [("p", tkind, param)], op, probe, ice_type
        )
        if rejected:
            assert not any(_ops[op](m, probe) for m in members), (
                f"pruned a file with a matching row: {kind} op={op} probe={probe!r} "
                f"pv={pv!r} members={members!r}"
            )
        # and equality pruning must be EFFECTIVE: a file whose transform
        # value differs from the probe's is always rejected
        if op == "=" and pv != tv(probe):
            assert rejected


# ---------------------------------------------------------------------------
# Incremental-view MIN/MAX maintenance: after every refresh in a random
# append/delete sequence, the view equals a from-scratch groupBy — including
# displaced extremes (deleted min/max), duplicate-extreme ties, vanished
# groups, and MoR deletes (DV identity swaps).
@st.composite
def _ivm_minmax_case(draw):
    ops = draw(st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 90)),
            st.tuples(st.just("del_lt"), st.integers(0, 60)),
            st.tuples(st.just("del_mor_ge"), st.integers(20, 95)),
            st.tuples(st.just("del_eq_bucket"), st.integers(0, 2)),
        ),
        min_size=1, max_size=4,
    ))
    return ops


@given(_ivm_minmax_case())
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_ivm_minmax_sequence_matches_rebuild(spark, tmp_path, case):
    import uuid

    from bears_spark.io.incremental_view import IncrementalAggView
    from bears_spark.io.snapshot_table import SnapshotTable

    def mk(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id", "id % 3 AS bucket", "id AS v", "id % 5 AS w"
        )

    def rollup(df):
        return {
            (r["bucket"],): (r["n"], r["vmin"], r["vmax"], r["wmin"], r["wmax"])
            for r in df.groupBy("bucket").agg(
                F.count("*").alias("n"), F.min("v").alias("vmin"),
                F.max("v").alias("vmax"), F.min("w").alias("wmin"),
                F.max("w").alias("wmax"),
            ).collect()
        }

    def vstate(view):
        return {
            (r["bucket"],): (r["n_rows"], r["v_min"], r["v_max"], r["w_min"], r["w_max"])
            for r in view.read().collect()
        }

    root = tmp_path / uuid.uuid4().hex
    base = SnapshotTable(spark, str(root / "b"))
    view = IncrementalAggView(
        spark, base, str(root / "v"),
        group_cols=["bucket"], sum_cols=[], minmax_cols=["v", "w"],
    )
    base.overwrite(mk(30, 50).coalesce(1))
    view.refresh()
    assert vstate(view) == rollup(base.read())
    for op, arg in case:
        if op == "append":
            base.append(mk(arg, arg + 7).coalesce(1))
        elif op == "del_lt":
            base.delete_where("id", "<", arg)
        elif op == "del_mor_ge":
            base.delete_where("id", ">=", arg, mode="mor")
        else:
            base.delete_where("bucket", "=", arg)
        view.refresh()
        try:
            live = rollup(base.read())
        except ValueError:
            break  # every row deleted: snapshot has no data files
        assert vstate(view) == live, (op, arg)


# ---------------------------------------------------------------------------
# Continuous Iceberg export: random churn, re-exported after every commit —
# each export appends ONE snapshot exactly when state changed, the latest
# snapshot equals the table's live rows, and EVERY prior snapshot still
# time-travels to its own state (manifest reuse, EXISTING rewrites,
# positional-delete manifests).
@st.composite
def _crashpoint_churn_case(draw):
    steps = draw(st.lists(
        st.tuples(st.sampled_from(["append", "cow", "mor", "overwrite"]),
                  st.integers(min_value=0, max_value=60),
                  st.integers(min_value=1, max_value=25)),
        min_size=2, max_size=5,
    ))
    # which steps the exporter "survives" to run after (False = the exporter
    # crashed before exporting that commit; the next export sees a
    # multi-commit diff). The final export always happens (recovery).
    mask = draw(st.lists(st.booleans(), min_size=len(steps), max_size=len(steps)))
    return steps, mask


@given(_crashpoint_churn_case())
@_lakehouse_settings
def test_export_iceberg_crashpoint_exports_match_history(spark, tmp_path, case):
    """Exporter crash-point fuzzing: random churn where the incremental
    Iceberg export randomly SKIPS commits (a crashed replicator), so each
    surviving export must fold a MULTI-commit diff — and a recovery export
    at the end plus an immediate re-export (the replayed batch) must leave
    the replica equal to the table with the re-export writing nothing
    (DV-set fingerprint idempotency)."""
    import os as _os
    import uuid as _uuid

    from pyspark.sql import functions as F

    from bears_spark.io.iceberg_log import IcebergTableReader, export_iceberg_metadata
    from bears_spark.io.snapshot_table import SnapshotTable

    steps, mask = case
    tag = _uuid.uuid4().hex[:8]
    t = SnapshotTable(spark, str(tmp_path / f"crash-{tag}"))
    out = str(tmp_path / f"crash-{tag}-ice")
    t.overwrite(spark.range(0, 40).select(F.col("id")).repartition(2))
    live = set(range(40))
    export_iceberg_metadata(t, out)
    nxt = 1000
    for (op, lo, span), survived in zip(steps, mask):
        if op == "append":
            t.append(spark.range(nxt, nxt + span).select(F.col("id")).coalesce(1))
            live |= set(range(nxt, nxt + span))
            nxt += span
        elif op == "overwrite":
            t.overwrite(spark.range(lo, lo + span).select(F.col("id")).repartition(2))
            live = set(range(lo, lo + span))
        else:
            t.delete_where("id", "<", lo, mode=op if op == "mor" else "cow")
            live = {i for i in live if not i < lo}
        if not live:
            break
        if survived:
            export_iceberg_metadata(t, out)
            got = {x["id"] for x in IcebergTableReader(spark, out).read().collect()}
            assert got == live, ("post-crash export diverged", steps, mask)
    if not live:
        return
    export_iceberg_metadata(t, out)  # recovery export
    meta_dir = _os.path.join(out, "metadata")
    before = sorted(_os.listdir(meta_dir))
    export_iceberg_metadata(t, out)  # replayed batch: must write NOTHING
    assert sorted(_os.listdir(meta_dir)) == before, (steps, mask)
    got = {x["id"] for x in IcebergTableReader(spark, out).read().collect()}
    assert got == live, (steps, mask)


@given(_export_churn_case())
@_lakehouse_settings
def test_export_iceberg_continuous_matches_table_history(spark, tmp_path, case):
    import uuid as _uuid

    from pyspark.sql import functions as F

    from bears_spark.io.iceberg_log import IcebergTableReader, export_iceberg_metadata
    from bears_spark.io.snapshot_table import SnapshotTable

    tag = _uuid.uuid4().hex[:8]
    t = SnapshotTable(spark, str(tmp_path / f"ichurn-{tag}"))
    out = str(tmp_path / f"ichurn-{tag}-ice")
    t.overwrite(spark.range(0, 40).select(F.col("id")).repartition(2))
    live = set(range(40))
    export_iceberg_metadata(t, out)
    history = {IcebergTableReader(spark, out).current_snapshot_id(): set(live)}
    nxt = 1000
    for op, lo, span in case:
        if op == "append":
            t.append(spark.range(nxt, nxt + span).select(F.col("id")).coalesce(1))
            live |= set(range(nxt, nxt + span))
            nxt += span
        elif op == "overwrite":
            t.overwrite(spark.range(lo, lo + span).select(F.col("id")).repartition(2))
            live = set(range(lo, lo + span))
        else:
            t.delete_where("id", "<", lo, mode=op if op == "mor" else "cow")
            live = {i for i in live if not i < lo}
        if not live:
            # an emptied table exports an empty snapshot, but snapshot reads
            # of zero files raise by contract (same as SnapshotTable.read) —
            # covered by the deterministic empty-export test instead
            break
        export_iceberg_metadata(t, out)
        history[IcebergTableReader(spark, out).current_snapshot_id()] = set(live)
    r = IcebergTableReader(spark, out)
    assert r.current_snapshot_id() == max(history)
    assert set(history) == set(range(1, len(history) + 1))  # contiguous snapshot ids
    for sid, want in sorted(history.items()):
        got = {x["id"] for x in r.read(snapshot_id=sid).collect()}
        assert got == want, (sid, case)


# ---------------------------------------------------------------------------
# Schema evolution: random DDL/DML sequences vs a pure-Python model.
# rename/drop/add are metadata-only commits over a logical->physical mapping
# with tombstoned ids; the model tracks rows as {id -> {col: val}} plus the
# live column list, and every version's snapshot is recorded so time travel
# across renames can be replayed and checked (VERDICT r10 #3's hard part:
# each snapshot serves ITS OWN names).


@st.composite
def _schema_evo_case(draw):
    ops = draw(st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 80)),
            st.tuples(st.just("rename"), st.integers(0, 9)),
            st.tuples(st.just("add"), st.integers(0, 9)),
            st.tuples(st.just("drop"), st.integers(0, 9)),
            st.tuples(st.just("del_ge"), st.integers(0, 90)),
            st.tuples(st.just("del_mor_keys"), st.integers(0, 90)),
            st.tuples(st.just("upd_ge"), st.integers(0, 90)),
            st.tuples(st.just("compact"), st.just(0)),
        ),
        min_size=2, max_size=6,
    ))
    return ops


@given(_schema_evo_case())
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_schema_evolution_sequence_matches_model(spark, tmp_path, case):
    import uuid

    from bears_spark.io.snapshot_table import SnapshotTable

    root = tmp_path / uuid.uuid4().hex
    t = SnapshotTable(spark, str(root))
    cols = ["id", "v"]            # live LOGICAL columns, in order
    rows = {i: {"id": i, "v": i * 2} for i in range(10)}
    t.overwrite(spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows.values()], "id long, v long"
    ).coalesce(1))
    history = {t.current_version(): (list(cols), {i: dict(r) for i, r in rows.items()})}
    fresh = 0
    for op, arg in case:
        try:
            if op == "append":
                new_ids = [arg * 100 + 1000 + j for j in range(3)]
                t.append(spark.createDataFrame(
                    [tuple(i if c == "id" else i * 2 for c in cols) for i in new_ids],
                    ", ".join(f"{c} long" for c in cols),
                ).coalesce(1))
                for i in new_ids:
                    rows[i] = {c: (i if c == "id" else i * 2) for c in cols}
            elif op == "rename":
                old = cols[arg % len(cols)]
                if old == "id":
                    continue  # keep the key column stable for DML targeting
                new = f"c{fresh}"
                fresh += 1
                t.rename_column(old, new)
                cols[cols.index(old)] = new
                for r in rows.values():
                    r[new] = r.pop(old)
            elif op == "add":
                new = f"c{fresh}"
                fresh += 1
                t.add_column(new, "long")
                cols.append(new)
                for r in rows.values():
                    r[new] = None
            elif op == "drop":
                victim = cols[arg % len(cols)]
                if victim == "id" or len(cols) == 1:
                    continue
                t.drop_column(victim)
                cols.remove(victim)
                for r in rows.values():
                    r.pop(victim, None)
            elif op == "del_ge":
                t.delete_where("id", ">=", arg + 900)
                rows = {i: r for i, r in rows.items() if not (i >= arg + 900)}
            elif op == "del_mor_keys":
                ks = [arg + 900, arg + 901]
                t.delete_keys("id", ks, mode="mor")
                rows = {i: r for i, r in rows.items() if i not in ks}
            elif op == "upd_ge":
                # UPDATE targets the LAST live column under its CURRENT
                # logical name — update across rename/drop/add interleavings
                target = cols[-1]
                if target == "id":
                    continue
                t.update_where("id", ">=", arg + 900,
                               set={target: F.lit(arg)},
                               mode="mor" if arg % 2 else "cow")
                for i, r in rows.items():
                    if i >= arg + 900:
                        r[target] = arg
            else:
                t.compact(target_rows_per_file=100)
            history[t.current_version()] = (
                list(cols), {i: dict(r) for i, r in rows.items()}
            )
        except ValueError as e:
            if "no data files" in str(e) or "no schema source" in str(e):
                break
            raise
        got_cols = t.read().columns
        assert got_cols == cols, (op, arg, got_cols, cols)
        got = {r["id"]: {c: r[c] for c in cols} for r in t.read().collect()}
        assert got == rows, (op, arg)
    # time travel: every recorded version still serves ITS OWN names + rows
    for v, (vcols, vrows) in history.items():
        if not vrows:
            continue
        df = t.read(version=v)
        assert df.columns == vcols, (v, df.columns, vcols)
        got = {r["id"]: {c: r[c] for c in vcols} for r in df.collect()}
        assert got == vrows, (v, case)


# Type widening + DML interleavings vs a typed pure-Python model: widen is
# metadata-only, so the file set mixes physical widths after it — every op
# (append beyond-int32 values, CoW/MoR delete, merge, compact) must read the
# mix through the explicit widened schema, and time travel must serve each
# version's OWN width (VERDICT-style refs: io/snapshot_table.py
# alter_column_type).


@st.composite
def _widen_case(draw):
    return draw(st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 50)),
            st.tuples(st.just("widen_v"), st.just(0)),
            st.tuples(st.just("rename_v"), st.just(0)),
            st.tuples(st.just("merge"), st.integers(0, 50)),
            st.tuples(st.just("del_ge"), st.integers(0, 9)),
            st.tuples(st.just("del_mor"), st.integers(0, 9)),
            st.tuples(st.just("upd_ge"), st.integers(0, 9)),
            st.tuples(st.just("compact"), st.just(0)),
        ),
        min_size=3, max_size=7,
    ))


@given(_widen_case())
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_type_widening_sequence_matches_model(spark, tmp_path, case):
    import uuid

    from bears_spark.io.snapshot_table import SnapshotTable

    root = tmp_path / uuid.uuid4().hex
    t = SnapshotTable(spark, str(root))
    vname, vtype = "v", "int"  # logical name + declared type of the value col
    rows = {i: i * 2 for i in range(6)}  # id -> v
    t.overwrite(spark.createDataFrame(
        sorted(rows.items()), "id int, v int"
    ).coalesce(1))
    history = {t.current_version(): (vname, vtype, dict(rows))}
    nid = 1000
    for op, arg in case:
        if op == "append":
            # beyond-int32 values ONLY once widened — the point of the widen
            val = (2**40 + arg) if vtype == "bigint" else arg
            nid += 1
            t.append(spark.createDataFrame(
                [(nid, val)], f"id int, {vname} {'long' if vtype == 'bigint' else 'int'}"
            ).coalesce(1))
            rows[nid] = val
        elif op == "widen_v":
            if vtype == "bigint":
                continue
            t.alter_column_type(vname, "bigint")
            vtype = "bigint"
        elif op == "rename_v":
            new = vname + "x"
            t.rename_column(vname, new)
            vname = new
        elif op == "merge":
            val = (2**41 + arg) if vtype == "bigint" else (500 + arg)
            src = spark.createDataFrame(
                [(0, val), (nid + 7000, val)],
                f"id int, {vname} {'long' if vtype == 'bigint' else 'int'}",
            ).coalesce(1)
            t.merge(src, key="id")
            rows[0] = val
            rows[nid + 7000] = val
        elif op == "del_ge":
            cut = 1002 + arg
            t.delete_where("id", ">=", cut)
            rows = {i: v for i, v in rows.items() if i < cut}
        elif op == "del_mor":
            t.delete_keys("id", [arg], mode="mor")
            rows.pop(arg, None)
        elif op == "upd_ge":
            # update the value column under its CURRENT logical name across
            # the rename/widen interleavings; matched rows bump by 7
            t.update_where("id", ">=", arg, set={vname: F.col(vname) + 7},
                           mode="mor" if arg % 2 else "cow")
            rows = {i: (v + 7 if i >= arg else v) for i, v in rows.items()}
        else:
            t.compact(target_rows_per_file=100)
        history[t.current_version()] = (vname, vtype, dict(rows))
        df = t.read()
        assert df.schema[vname].dataType.simpleString() == vtype, (op, arg)
        got = {r["id"]: r[vname] for r in df.collect()}
        assert got == rows, (op, arg, got, rows)
    # time travel: every version serves its OWN name, width and rows
    for ver, (name, typ, vrows) in history.items():
        df = t.read(version=ver)
        assert df.schema[name].dataType.simpleString() == typ, (ver, case)
        got = {r["id"]: r[name] for r in df.collect()}
        assert got == vrows, (ver, case)


# Branch/publish semantics vs a model: fork copies state; main and branch
# evolve independently; publish fast-forwards ONLY when main is still at the
# fork point, else raises BranchConflictError — whatever the interleaving
# (io/snapshot_table.py publish_branch).


@st.composite
def _wap_case(draw):
    return draw(st.lists(
        st.one_of(
            st.tuples(st.just("main_append"), st.integers(0, 30)),
            st.tuples(st.just("branch_append"), st.integers(0, 30)),
            st.tuples(st.just("branch_del"), st.integers(0, 5)),
            st.tuples(st.just("publish"), st.just(0)),
        ),
        min_size=2, max_size=8,
    ))


@given(_wap_case())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_branch_publish_matches_model(spark, tmp_path, case):
    import uuid

    from bears_spark.io.snapshot_table import BranchConflictError, SnapshotTable

    root = tmp_path / uuid.uuid4().hex
    t = SnapshotTable(spark, str(root))
    main = {i: i * 10 for i in range(4)}
    t.overwrite(spark.createDataFrame(sorted(main.items()), "id int, v int").coalesce(1))
    b = t.create_branch("wap")
    branch = dict(main)
    main_moved = False  # has main advanced past the fork point?
    nid = 100
    for op, arg in case:
        if op == "main_append":
            nid += 1
            t.append(spark.createDataFrame([(nid, arg)], "id int, v int").coalesce(1))
            main[nid] = arg
            main_moved = True
        elif op == "branch_append":
            nid += 1
            b.append(spark.createDataFrame([(nid, arg)], "id int, v int").coalesce(1))
            branch[nid] = arg
        elif op == "branch_del":
            b.delete_keys("id", [arg], mode="cow")
            branch.pop(arg, None)
        else:  # publish
            if main_moved:
                with pytest.raises(BranchConflictError):
                    t.publish_branch("wap")
            else:
                t.publish_branch("wap")
                main = dict(branch)
                # publish itself advances main past the fork point: a branch
                # is single-publish — re-fork to continue (Iceberg's WAP
                # shape is fork-per-ingest-batch)
                main_moved = True
        got_main = {r["id"]: r["v"] for r in t.read().collect()}
        got_branch = {r["id"]: r["v"] for r in b.read().collect()}
        assert got_main == main, (op, arg, got_main, main)
        assert got_branch == branch, (op, arg, got_branch, branch)
