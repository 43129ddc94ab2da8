"""SparkFrame / SparkColumn — the pandas-flavored lazy frame surface.

Reference parity: ScalableDataFrame / ScalableSeries
(src/bears/core/frame/ScalableDataFrame.py:84, ScalableSeries.py:49). bears
wraps one of several physical layouts and dispatches eagerly; here there is a
single layout (the Spark DataFrame) and every method extends the Catalyst
logical plan lazily — equivalent to bears' DASK path
(DaskScalableDataFrame.py:47) where nothing runs until persist/compute.

API rules carried over:
- ``of()`` accepts pandas / list-of-dicts / dict-of-arrays / Spark DataFrame
  (detect_layout priority, ScalableDataFrame.py:180-199).
- ``sdf[col]`` -> column facade; ``sdf[[c1,c2]]`` -> projection; boolean-mask
  filter; ``sdf[col] = expr`` -> withColumn.
- Frame-level sum/mean raise, pointing to the Series (ScalableDataFrame.py:1489).
- ``concat`` unions by name filling missing columns with null
  (DictScalableDataFrame.py:222-242 fills NaN).
- ``merge`` reproduces pandas suffix/indicator semantics on top of Spark joins
  (ScalableDataFrame.py:1820-1836 delegates to pandas.merge).

Scale notes: every method is a narrow/declarative plan transformation; the only
driver-side materializations are explicit (``to_pandas``, ``collect``,
``compute``) or tiny-by-construction (scalar aggregates).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Mapping, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bears_spark.types import MLTypeSchema, mltype_schema_to_struct

RawData = Union[pd.DataFrame, DataFrame, List[dict], Dict[str, Any], "SparkFrame"]


class MergeError(ValueError):
    """Raised by merge(validate=...) when key uniqueness is violated
    (mirrors pandas.errors.MergeError)."""


def _elementwise_pandas_udf(func: Callable, returnType: str):
    """Wrap a scalar Python function as an Arrow-batched pandas_udf.

    nulls reach ``func`` as None (matching row-UDF semantics), not pandas NaN.
    """

    def _vec(s: pd.Series) -> pd.Series:
        return pd.Series(
            [func(None if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)) else v) for v in s],
            dtype=object,
        )

    return F.pandas_udf(_vec, returnType)


def _normalize_nan_to_null(df: DataFrame) -> DataFrame:
    """Engine rule (SURVEY.md §7 known-hard #1): bears conflates NaN/None via
    pd.isnull; Spark distinguishes. We normalize float NaN -> null at ingest so
    isna/fillna/dropna behave like the reference."""
    exprs = []
    changed = False
    for f in df.schema.fields:
        if f.dataType.typeName() in ("double", "float"):
            exprs.append(F.when(F.isnan(F.col(f.name)), F.lit(None)).otherwise(F.col(f.name)).alias(f.name))
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


class SparkColumn:
    """Lazy 1-D facade: a Column expression bound to a parent DataFrame.

    Comparison/arith operators build Column predicates (ScalableSeries.py:728-836);
    reductions execute a single tiny aggregation and return a Python scalar.
    """

    def __init__(self, df: DataFrame, col: Column, name: str | None = None):
        self._df = df
        self._col = col
        self.name = name

    # -- expression builders (lazy) ------------------------------------
    def _wrap(self, col: Column) -> "SparkColumn":
        return SparkColumn(self._df, col, self.name)

    def __lt__(self, other):
        return self._wrap(self._col < _unwrap(other))

    def __le__(self, other):
        return self._wrap(self._col <= _unwrap(other))

    def __gt__(self, other):
        return self._wrap(self._col > _unwrap(other))

    def __ge__(self, other):
        return self._wrap(self._col >= _unwrap(other))

    def __eq__(self, other):  # type: ignore[override]
        return self._wrap(self._col == _unwrap(other))

    def __ne__(self, other):  # type: ignore[override]
        return self._wrap(self._col != _unwrap(other))

    def __add__(self, other):
        return self._wrap(self._col + _unwrap(other))

    def __radd__(self, other):
        return self._wrap(_unwrap(other) + self._col)

    def __sub__(self, other):
        return self._wrap(self._col - _unwrap(other))

    def __rsub__(self, other):
        return self._wrap(F.lit(other) - self._col)

    def __mul__(self, other):
        return self._wrap(self._col * _unwrap(other))

    def __rmul__(self, other):
        return self._wrap(_unwrap(other) * self._col)

    def __truediv__(self, other):
        return self._wrap(self._col / _unwrap(other))

    def __floordiv__(self, other):
        return self._wrap(F.floor(self._col / _unwrap(other)))

    def __mod__(self, other):
        return self._wrap(self._col % _unwrap(other))

    def __pow__(self, other):
        return self._wrap(F.pow(self._col, _unwrap(other)))

    def __divmod__(self, other):
        o = _unwrap(other)
        return (self._wrap(F.floor(self._col / o)), self._wrap(self._col % o))

    def dot(self, other) -> Any:
        """Series dot product (ScalableSeries.py:838-847): one aggregate —
        sum of the elementwise product. Both columns must come from the same
        frame (aligned rows)."""
        return self._agg(F.sum(self._col * _unwrap(other)))

    def __and__(self, other):
        return self._wrap(self._col & _unwrap(other))

    def __or__(self, other):
        return self._wrap(self._col | _unwrap(other))

    def __invert__(self):
        return self._wrap(~self._col)

    def __neg__(self):
        return self._wrap(-self._col)

    def isin(self, values: Iterable[Any]) -> "SparkColumn":
        return self._wrap(self._col.isin(list(values)))

    def between(self, lower, upper) -> "SparkColumn":
        return self._wrap(self._col.between(lower, upper))

    def clip(self, lower=None, upper=None) -> "SparkColumn":
        c = self._col
        if lower is not None:
            c = F.greatest(c, F.lit(lower))
        if upper is not None:
            c = F.least(c, F.lit(upper))
        return self._wrap(c)

    def abs(self) -> "SparkColumn":
        return self._wrap(F.abs(self._col))

    def round(self, decimals: int = 0) -> "SparkColumn":
        return self._wrap(F.round(self._col, decimals))

    def astype(self, dtype: str) -> "SparkColumn":
        _MAP = {"int": "long", "int64": "long", "float": "double", "float64": "double", "str": "string", "bool": "boolean"}
        return self._wrap(self._col.cast(_MAP.get(dtype, dtype)))

    def isna(self) -> "SparkColumn":
        return self._wrap(self._col.isNull())

    isnull = isna

    def notna(self) -> "SparkColumn":
        return self._wrap(self._col.isNotNull())

    notnull = notna

    def fillna(self, value: Any) -> "SparkColumn":
        return self._wrap(F.coalesce(self._col, F.lit(value)))

    def map(self, mapping: Mapping[Any, Any] | Callable, na_action: str | None = "ignore") -> "SparkColumn":
        """Dict map compiles to a literal MAP lookup (broadcast-free for small
        dicts; JVM-side) — ScalableSeries.map (ScalableSeries.py:855-867)."""
        if callable(mapping):
            return self.apply(mapping)
        pairs: list = []
        for k, v in mapping.items():
            pairs.extend([F.lit(k), F.lit(v)])
        m = F.create_map(*pairs)
        return self._wrap(m[self._col])

    def apply(self, func: Callable, returnType: str = "string") -> "SparkColumn":
        """Arbitrary-Python escape hatch; prefer built-ins. Compiles to an
        Arrow-batched pandas_udf (ArrowEvalPython), not a row-at-a-time
        PythonUDF — same semantics, ~10-100x less serialization overhead."""
        return self._wrap(_elementwise_pandas_udf(func, returnType)(self._col))

    # -- pandas-style accessor namespaces ------------------------------
    @property
    def str(self) -> "_StrAccessor":
        """pandas .str namespace (reference gets it via pandas delegation on
        the PANDAS layout; here every method compiles to a Column expr)."""
        return _StrAccessor(self)

    @property
    def dt(self) -> "_DtAccessor":
        """pandas .dt namespace — a capability gain (the reference has the
        TIMESTAMP MLType but no temporal operators, ScalableSeries.py:405-417)."""
        return _DtAccessor(self)

    # -- string accessor-ish helpers -----------------------------------
    def lower(self) -> "SparkColumn":
        return self._wrap(F.lower(self._col))

    def upper(self) -> "SparkColumn":
        return self._wrap(F.upper(self._col))

    def strip(self) -> "SparkColumn":
        return self._wrap(F.trim(self._col))

    def contains(self, pat: str) -> "SparkColumn":
        return self._wrap(self._col.contains(pat))

    def startswith(self, pat: str) -> "SparkColumn":
        return self._wrap(self._col.startswith(pat))

    def endswith(self, pat: str) -> "SparkColumn":
        return self._wrap(self._col.endswith(pat))

    # -- reductions (single tiny agg action) ---------------------------
    def _agg(self, expr: Column) -> Any:
        return self._df.select(expr.alias("v")).first()["v"]

    def sum(self):
        return self._agg(F.sum(self._col))

    def mean(self):
        return self._agg(F.avg(self._col))

    def min(self):
        return self._agg(F.min(self._col))

    def max(self):
        return self._agg(F.max(self._col))

    def std(self, ddof: int = 1):
        return self._agg(F.stddev_samp(self._col) if ddof else F.stddev_pop(self._col))

    def var(self, ddof: int = 1):
        return self._agg(F.var_samp(self._col) if ddof else F.var_pop(self._col))

    def median(self):
        return self._agg(F.median(self._col))

    def prod(self):
        return self._agg(F.product(self._col))

    def mode(self):
        return self._agg(F.mode(self._col))

    def quantile(self, q: float = 0.5, approx: bool = False, accuracy: int = 10000):
        """Exact percentile by default; ``approx=True`` uses
        percentile_approx (Greenwald-Khanna) — the 100TB-scale path where an
        exact percentile would shuffle every value."""
        if approx:
            return self._agg(F.percentile_approx(self._col, F.lit(q), F.lit(accuracy)))
        return self._agg(F.percentile(self._col, F.lit(q)))

    def count(self) -> int:
        return int(self._agg(F.count(self._col)))

    def nunique(self, approx: bool = False) -> int:
        # exact by default (parity with pandas nunique); approx_count_distinct
        # is the 100TB-scale path the caller opts into.
        return int(self._agg(F.approx_count_distinct(self._col) if approx else F.countDistinct(self._col)))

    def unique(self) -> list:
        return [r["v"] for r in self._df.select(self._col.alias("v")).distinct().collect()]

    def all(self) -> bool:
        return bool(self._agg(F.coalesce(F.bool_and(self._col.cast("boolean")), F.lit(True))))

    def any(self) -> bool:
        return bool(self._agg(F.coalesce(F.bool_or(self._col.cast("boolean")), F.lit(False))))

    def hasnans(self) -> bool:
        return bool(self._agg(F.max(self._col.isNull())))

    def is_unique(self) -> bool:
        row = self._df.select(F.count(self._col).alias("n"), F.countDistinct(self._col).alias("d")).first()
        return row["n"] == row["d"]

    def mad(self):
        """Mean absolute deviation around the mean (ScalableSeries.py:959) —
        two chained tiny aggregations (mean, then avg|x-mean|)."""
        m = self.mean()
        if m is None:
            return None
        return self._agg(F.avg(F.abs(self._col - F.lit(m))))

    def sem(self, ddof: int = 1):
        """Standard error of the mean: std/sqrt(n)."""
        row = self._df.select(
            (F.stddev_samp(self._col) if ddof else F.stddev_pop(self._col)).alias("s"),
            F.count(self._col).alias("n"),
        ).first()
        if row["s"] is None or not row["n"]:
            return None
        return row["s"] / (row["n"] ** 0.5)

    def skew(self):
        return self._agg(F.skewness(self._col))

    def kurt(self):
        return self._agg(F.kurtosis(self._col))

    def is_monotonic_increasing(self, order_col: str = "__row_id__") -> bool:
        """True iff values never decrease along ``order_col`` order
        (ScalableSeries.py:971-979). Nulls → False, empty → True (pandas)."""
        return self._is_monotonic(order_col, decreasing=False)

    def is_monotonic_decreasing(self, order_col: str = "__row_id__") -> bool:
        """True iff values never increase along ``order_col`` order
        (ScalableSeries.py:981-988)."""
        return self._is_monotonic(order_col, decreasing=True)

    def _is_monotonic(self, order_col: str, decreasing: bool, num_buckets: int = 64) -> bool:
        """Distributed monotonicity: a global-order lag would sort everything
        into ONE partition, so instead range-bucket ``order_col`` (numeric,
        unique), lag WITHIN each bucket in parallel, and compare the
        ``num_buckets`` bucket boundaries (first/last value per bucket) in a
        second, tiny window."""
        df = self._df.select(F.col(order_col).alias("__o__"), self._col.alias("__v__"))
        head = df.agg(
            F.min("__o__").alias("lo"),
            F.max("__o__").alias("hi"),
            F.coalesce(F.max(F.col("__v__").isNull()), F.lit(False)).alias("nulls"),
        ).first()
        if head["nulls"]:
            return False
        if head["lo"] is None or head["lo"] == head["hi"]:
            return True  # empty or single row
        df = df.withColumn(
            "__b__",
            F.width_bucket(F.col("__o__").cast("double"), F.lit(float(head["lo"])), F.lit(float(head["hi"])), F.lit(num_buckets)),
        )
        w = Window.partitionBy("__b__").orderBy("__o__")
        prev = F.lag("__v__").over(w)
        viol = (F.col("__v__") > prev) if decreasing else (F.col("__v__") < prev)
        per_bucket = (
            df.withColumn("__viol__", F.coalesce(viol, F.lit(False)))
            .groupBy("__b__")
            .agg(
                F.max("__viol__").alias("any_viol"),
                F.min_by("__v__", "__o__").alias("first_v"),
                F.max_by("__v__", "__o__").alias("last_v"),
            )
        )
        wb = Window.orderBy("__b__")  # <= num_buckets+1 rows: single partition is fine
        prev_last = F.lag("last_v").over(wb)
        bviol = (F.col("first_v") > prev_last) if decreasing else (F.col("first_v") < prev_last)
        bad = per_bucket.select(
            (F.col("any_viol") | F.coalesce(bviol, F.lit(False))).alias("bad")
        ).agg(F.max("bad").alias("bad")).first()
        return not bool(bad["bad"])

    def idxmax(self, idx_col: str = "__row_id__"):
        return self._agg(F.max_by(F.col(idx_col), self._col))

    def idxmin(self, idx_col: str = "__row_id__"):
        return self._agg(F.min_by(F.col(idx_col), self._col))

    def value_counts(self, ascending: bool = False) -> pd.DataFrame:
        df = self._df.select(self._col.alias("value")).groupBy("value").count()
        df = df.orderBy(F.asc("count") if ascending else F.desc("count"))
        return df.toPandas()

    def nlargest(self, n: int = 5) -> list:
        # Catalyst TakeOrderedAndProject — distributed top-k, no full sort.
        return [r["v"] for r in self._df.select(self._col.alias("v")).orderBy(F.desc("v")).limit(n).collect()]

    def nsmallest(self, n: int = 5) -> list:
        return [r["v"] for r in self._df.select(self._col.alias("v")).orderBy(F.asc("v")).limit(n).collect()]

    def to_pandas(self) -> pd.Series:
        name = self.name or "values"
        return self._df.select(self._col.alias(name)).toPandas()[name]

    @property
    def spark(self) -> Column:
        return self._col


def _unwrap(x):
    return x._col if isinstance(x, SparkColumn) else x


class _StrAccessor:
    """pandas Series.str surface over a SparkColumn (expression-compiled)."""

    def __init__(self, col: "SparkColumn"):
        self._c = col

    def _w(self, expr: Column) -> "SparkColumn":
        return self._c._wrap(expr)

    def lower(self):
        return self._w(F.lower(self._c._col))

    def upper(self):
        return self._w(F.upper(self._c._col))

    def strip(self):
        return self._w(F.trim(self._c._col))

    def lstrip(self):
        return self._w(F.ltrim(self._c._col))

    def rstrip(self):
        return self._w(F.rtrim(self._c._col))

    def len(self):
        return self._w(F.length(self._c._col))

    def contains(self, pat: str, regex: bool = False):
        return self._w(self._c._col.rlike(pat) if regex else self._c._col.contains(pat))

    def startswith(self, pat: str):
        return self._w(self._c._col.startswith(pat))

    def endswith(self, pat: str):
        return self._w(self._c._col.endswith(pat))

    def replace(self, pat: str, repl: str, regex: bool = True):
        if regex:
            return self._w(F.regexp_replace(self._c._col, pat, repl))
        return self._w(F.replace(self._c._col, F.lit(pat), F.lit(repl)))

    def slice(self, start: int = 0, stop: int | None = None):
        length = (stop - start) if stop is not None else (1 << 30)
        return self._w(F.substring(self._c._col, start + 1, length))

    def split(self, pat: str = r"\s+"):
        return self._w(F.split(self._c._col, pat))

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        fn = F.lpad if side == "left" else F.rpad
        return self._w(fn(self._c._col, width, fillchar))

    def zfill(self, width: int):
        return self._w(F.lpad(self._c._col, width, "0"))

    def extract(self, pat: str, group: int = 1):
        return self._w(F.regexp_extract(self._c._col, pat, group))


class _DtAccessor:
    """pandas Series.dt surface over a timestamp SparkColumn."""

    def __init__(self, col: "SparkColumn"):
        self._c = col

    def _w(self, expr: Column) -> "SparkColumn":
        return self._c._wrap(expr)

    @property
    def year(self):
        return self._w(F.year(self._c._col))

    @property
    def month(self):
        return self._w(F.month(self._c._col))

    @property
    def day(self):
        return self._w(F.dayofmonth(self._c._col))

    @property
    def hour(self):
        return self._w(F.hour(self._c._col))

    @property
    def minute(self):
        return self._w(F.minute(self._c._col))

    @property
    def second(self):
        return self._w(F.second(self._c._col))

    @property
    def date(self):
        return self._w(self._c._col.cast("date"))

    @property
    def dayofweek(self):
        # pandas: Monday=0..Sunday=6; Spark dayofweek: Sunday=1..Saturday=7
        return self._w((F.dayofweek(self._c._col) + 5) % 7)

    @property
    def dayofyear(self):
        return self._w(F.dayofyear(self._c._col))

    @property
    def week(self):
        return self._w(F.weekofyear(self._c._col))

    @property
    def quarter(self):
        return self._w(F.quarter(self._c._col))

    def floor(self, freq: str):
        return self._w(F.date_trunc(freq, self._c._col))

    def strftime(self, fmt: str):
        return self._w(F.date_format(self._c._col, fmt))


class _GroupBy:
    """df.groupby(...) facade -> Spark groupBy with pandas-style agg dict."""

    _FN = {
        "sum": F.sum,
        "mean": F.avg,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "std": F.stddev_samp,
        "var": F.var_samp,
        "median": F.median,
        "nunique": F.countDistinct,
        "first": F.first,
        "last": F.last,
        "collect_list": F.collect_list,
        "collect_set": F.collect_set,
    }

    def __init__(self, frame: "SparkFrame", by: list[str]):
        self._frame = frame
        self._by = by

    def agg(self, spec: Mapping[str, str | list[str]] | None = None, **named) -> "SparkFrame":
        exprs: list[Column] = []
        if spec:
            for col, fns in spec.items():
                for fn in [fns] if isinstance(fns, str) else fns:
                    exprs.append(self._FN[fn](F.col(col)).alias(f"{col}_{fn}"))
        for out_name, (col, fn) in named.items():
            exprs.append(self._FN[fn](F.col(col)).alias(out_name))
        return SparkFrame(self._frame.df.groupBy(*self._by).agg(*exprs))

    def size(self) -> "SparkFrame":
        return SparkFrame(self._frame.df.groupBy(*self._by).count())

    def count(self) -> "SparkFrame":
        return self.size()

    def apply_in_pandas(self, func: Callable, schema) -> "SparkFrame":
        return SparkFrame(self._frame.df.groupBy(*self._by).applyInPandas(func, schema))

    def transform(self, spec: Mapping[str, str | list[str]]) -> "SparkFrame":
        """pandas groupby().transform parity: broadcast each group aggregate
        back onto every row as ``{col}_{fn}``. Compiles to unbounded window
        aggregates over partitionBy(keys) — ONE shuffle on the group keys,
        no join back, no second pass; all requested aggregates share the
        same window partitioning."""
        w = Window.partitionBy(*self._by)
        out = self._frame.df
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                if fn not in self._FN:
                    raise ValueError(f"unsupported transform fn {fn!r}; known: {sorted(self._FN)}")
                out = out.withColumn(f"{col}_{fn}", self._FN[fn](F.col(col)).over(w))
        return SparkFrame(out)

    def __getattr__(self, fn_name: str):
        if fn_name not in self._FN:
            raise AttributeError(fn_name)

        def _apply(*cols: str) -> "SparkFrame":
            targets = list(cols) or [
                f.name
                for f in self._frame.df.schema.fields
                if f.name not in self._by and f.dataType.typeName() in ("long", "integer", "double", "float", "short")
            ]
            exprs = [self._FN[fn_name](F.col(c)).alias(c) for c in targets]
            return SparkFrame(self._frame.df.groupBy(*self._by).agg(*exprs))

        return _apply


class SparkFrame:
    """Lazy 2-D frame: thin wrapper over a pyspark DataFrame + MLType metadata."""

    # Methods bears deliberately blocks (ScalableDataFrame.py:1320-1472) that we
    # *do* support natively because Spark has them (free capability gain) are
    # simply implemented; nothing here needs a blocklist.

    def __init__(self, df: DataFrame):
        self.df = df

    # ---------------- construction ----------------
    @classmethod
    def of(cls, data: RawData, spark: SparkSession | None = None, schema: MLTypeSchema | None = None) -> "SparkFrame":
        """Layout auto-detect (ScalableDataFrame.of, :127-173): accepts Spark
        DataFrame / pandas / list-of-dicts / dict-of-arrays / SparkFrame."""
        if isinstance(data, SparkFrame):
            return cls(data.df)
        if isinstance(data, DataFrame):
            return cls(_normalize_nan_to_null(data))
        if spark is None:
            spark = SparkSession.getActiveSession()
            if spark is None:
                from bears_spark.session import get_session

                spark = get_session()
        struct = mltype_schema_to_struct(schema) if schema else None
        if isinstance(data, pd.DataFrame):
            if isinstance(data.index, pd.MultiIndex):
                raise ValueError("MultiIndex DataFrames are not supported")  # parity: PandasScalableDataFrame.py:25
            df = spark.createDataFrame(data, schema=struct)
        elif isinstance(data, dict):
            df = spark.createDataFrame(pd.DataFrame(data), schema=struct)
        elif isinstance(data, (list, tuple)):
            if len(data) and isinstance(data[0], dict):
                # sparse columns allowed: union of keys, missing -> null
                # (ListOfDictScalableDataFrame.py:54-59)
                df = spark.createDataFrame(pd.DataFrame(list(data)), schema=struct)
            else:
                raise ValueError("list input must be list-of-dicts")
        else:
            raise TypeError(f"cannot construct SparkFrame from {type(data)}")
        return cls(_normalize_nan_to_null(df))

    # ---------------- schema / metadata ----------------
    @property
    def columns(self) -> list[str]:
        return self.df.columns

    @property
    def columns_set(self) -> frozenset:
        return frozenset(self.df.columns)

    @property
    def schema(self):
        return self.df.schema

    @property
    def mltype_schema(self) -> MLTypeSchema:
        from bears_spark.types import struct_to_mltype_schema

        return struct_to_mltype_schema(self.df.schema)

    def __len__(self) -> int:
        return self.df.count()

    @property
    def shape(self) -> tuple[int, int]:
        return (len(self), len(self.df.columns))

    @property
    def npartitions(self) -> int:
        return self.df.rdd.getNumPartitions()

    # ---------------- projection / filter / mutation ----------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return SparkColumn(self.df, F.col(key), key)
        if isinstance(key, (list, tuple)) and all(isinstance(k, str) for k in key):
            return SparkFrame(self.df.select(*key))
        if isinstance(key, SparkColumn):
            return SparkFrame(self.df.filter(key.spark))
        if isinstance(key, Column):
            return SparkFrame(self.df.filter(key))
        raise KeyError(f"unsupported key {key!r}")

    def __setitem__(self, name: str, value) -> None:
        if isinstance(value, SparkColumn):
            col = value.spark
        elif isinstance(value, Column):
            col = value
        else:
            col = F.lit(value)
        self.df = self.df.withColumn(name, col)

    def select(self, *cols) -> "SparkFrame":
        return SparkFrame(self.df.select(*[_unwrap(c) for c in cols]))

    def filter(self, cond) -> "SparkFrame":
        return SparkFrame(self.df.filter(_unwrap(cond)))

    where = filter
    query = filter

    def assign(self, **exprs) -> "SparkFrame":
        df = self.df
        for name, v in exprs.items():
            df = df.withColumn(name, _unwrap(v) if isinstance(v, (SparkColumn, Column)) else F.lit(v))
        return SparkFrame(df)

    def rename(self, columns: Mapping[str, str]) -> "SparkFrame":
        df = self.df
        for old, new in columns.items():
            df = df.withColumnRenamed(old, new)
        return SparkFrame(df)

    def drop(self, columns: str | Sequence[str]) -> "SparkFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        return SparkFrame(self.df.drop(*cols))

    def head(self, n: int = 5) -> "SparkFrame":
        return SparkFrame(self.df.limit(n))

    def limit(self, n: int) -> "SparkFrame":
        return SparkFrame(self.df.limit(n))

    # ---------------- aggregation ----------------
    def groupby(self, by: str | Sequence[str], **_) -> _GroupBy:
        return _GroupBy(self, [by] if isinstance(by, str) else list(by))

    groupBy = groupby

    def agg(self, spec: Mapping[str, str | list[str]]) -> "SparkFrame":
        exprs = []
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                exprs.append(_GroupBy._FN[fn](F.col(col)).alias(f"{col}_{fn}"))
        return SparkFrame(self.df.agg(*exprs))

    # parity: frame-level reductions raise, pointing at the series
    # (ScalableDataFrame.py:1489-1525)
    def sum(self):
        raise NotImplementedError("use frame[col].sum() — reductions live on the series")

    mean = median = min = max = std = var = sum  # type: ignore[assignment]

    # ---------------- joins ----------------
    def merge(
        self,
        right: "SparkFrame | DataFrame",
        on: str | Sequence[str] | None = None,
        how: str = "inner",
        left_on: str | Sequence[str] | None = None,
        right_on: str | Sequence[str] | None = None,
        suffixes: tuple[str, str] = ("_x", "_y"),
        indicator: bool = False,
        broadcast: bool = False,
        validate: str | None = None,
    ) -> "SparkFrame":
        """pandas.merge semantics on Spark joins (ScalableDataFrame.py:1820-1836).

        Collision columns get pandas-style suffixes; ``indicator`` adds a
        ``_merge`` provenance column. ``broadcast=True`` hints the right side
        (use for dimension tables; Catalyst also auto-broadcasts under the
        configured threshold). ``validate`` ('1:1'/'1:m'/'m:1'/'m:m' and the
        spelled-out pandas aliases) eagerly checks key uniqueness on the
        constrained side(s) and raises MergeError — each check is one
        short-circuiting groupBy-count action, not a full materialization."""
        rdf = right.df if isinstance(right, SparkFrame) else right
        ldf = self.df
        how_map = {"inner": "inner", "left": "left", "right": "right", "outer": "full", "cross": "cross"}
        spark_how = how_map[how]

        if on is not None:
            keys = [on] if isinstance(on, str) else list(on)
            lkeys = rkeys = keys
        elif left_on is not None and right_on is not None:
            lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
            rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        else:
            raise ValueError("merge requires `on` or `left_on`/`right_on`")

        if validate is not None:
            _VALIDATE = {
                "1:1": (True, True), "one_to_one": (True, True),
                "1:m": (True, False), "one_to_many": (True, False),
                "m:1": (False, True), "many_to_one": (False, True),
                "m:m": (False, False), "many_to_many": (False, False),
            }
            if validate not in _VALIDATE:
                raise ValueError(f"invalid validate argument {validate!r}")
            left_unique, right_unique = _VALIDATE[validate]

            def _has_dup_keys(df: DataFrame, keys: list[str]) -> bool:
                return (
                    df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n__"))
                    .filter(F.col("__n__") > 1).limit(1).count() > 0
                )

            if left_unique and _has_dup_keys(ldf, lkeys):
                raise MergeError(f"Merge keys are not unique in left dataset; not a {validate} merge")
            if right_unique and _has_dup_keys(rdf, rkeys):
                raise MergeError(f"Merge keys are not unique in right dataset; not a {validate} merge")

        # pandas-style suffixes for non-key collisions
        collisions = (set(ldf.columns) & set(rdf.columns)) - (set(lkeys) & set(rkeys))
        for c in collisions:
            ldf = ldf.withColumnRenamed(c, c + suffixes[0])
            rdf = rdf.withColumnRenamed(c, c + suffixes[1])

        if indicator:
            ldf = ldf.withColumn("__l__", F.lit(True))
            rdf = rdf.withColumn("__r__", F.lit(True))

        if broadcast:
            rdf = F.broadcast(rdf)

        if lkeys == rkeys:
            joined = ldf.join(rdf, on=lkeys, how=spark_how)
        else:
            cond = None
            for lk, rk in zip(lkeys, rkeys):
                c = ldf[lk] == rdf[rk]
                cond = c if cond is None else (cond & c)
            joined = ldf.join(rdf, on=cond, how=spark_how)

        if indicator:
            joined = joined.withColumn(
                "_merge",
                F.when(F.col("__l__").isNotNull() & F.col("__r__").isNotNull(), F.lit("both"))
                .when(F.col("__l__").isNotNull(), F.lit("left_only"))
                .otherwise(F.lit("right_only")),
            ).drop("__l__", "__r__")
        return SparkFrame(joined)

    def join(self, *a, **k):
        raise NotImplementedError("use .merge() (parity: ScalableDataFrame.py:1486)")

    # ---------------- set ops ----------------
    @staticmethod
    def concat(frames: Sequence["SparkFrame"], reset_index: bool = True) -> "SparkFrame":
        """Row-wise union by name, missing columns -> null
        (ScalableDataFrame.concat :1838-1868; DICT layout fills NaN)."""
        dfs = [f.df for f in frames]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return SparkFrame(out)

    def drop_duplicates(self, subset: Sequence[str] | None = None) -> "SparkFrame":
        return SparkFrame(self.df.dropDuplicates(list(subset)) if subset else self.df.dropDuplicates())

    def duplicated(self, subset: Sequence[str] | None = None, out_col: str = "duplicated") -> "SparkFrame":
        keys = list(subset) if subset else self.df.columns
        w = Window.partitionBy(*keys)
        return SparkFrame(self.df.withColumn(out_col, F.count(F.lit(1)).over(w) > 1))

    def intersect(self, other: "SparkFrame") -> "SparkFrame":
        return SparkFrame(self.df.intersect(other.df))

    def except_all(self, other: "SparkFrame") -> "SparkFrame":
        return SparkFrame(self.df.exceptAll(other.df))

    def equals(self, other: "SparkFrame") -> bool:
        if self.df.schema != other.df.schema:
            return False
        return self.df.exceptAll(other.df).isEmpty() and other.df.exceptAll(self.df).isEmpty()

    def combine_first(self, other: "SparkFrame", on: str | Sequence[str]) -> "SparkFrame":
        """pandas combine_first with an explicit key (Spark has no implicit
        row index; the reference delegates the pandas method,
        ScalableDataFrame.py:1370): NULL holes in self are patched from
        ``other``, the row set is the key-union, and columns align as
        self's columns then other's extras — the CDC/upsert-apply shape.

        Plan: ONE full-outer equi-join on the key + a coalesce projection;
        with both sides bucketed/pre-partitioned on the key it is
        exchange-free. Scales as any key-partitioned join — no windows, no
        driver-side alignment."""
        keys = [on] if isinstance(on, str) else list(on)
        left, right = self.df.alias("__l__"), other.df.alias("__r__")
        cond = None
        for k in keys:
            c = F.col(f"__l__.{k}").eqNullSafe(F.col(f"__r__.{k}"))
            cond = c if cond is None else (cond & c)
        joined = left.join(right, on=cond, how="full_outer")
        l_cols, r_cols = set(self.df.columns), set(other.df.columns)
        out: list[Column] = []
        for k in keys:
            out.append(F.coalesce(F.col(f"__l__.{k}"), F.col(f"__r__.{k}")).alias(k))
        for c in self.df.columns:
            if c in keys:
                continue
            if c in r_cols:
                out.append(F.coalesce(F.col(f"__l__.{c}"), F.col(f"__r__.{c}")).alias(c))
            else:
                out.append(F.col(f"__l__.{c}").alias(c))
        for c in other.df.columns:
            if c not in keys and c not in l_cols:
                out.append(F.col(f"__r__.{c}").alias(c))
        return SparkFrame(joined.select(*out))

    # ---------------- missing data ----------------
    def isna(self) -> "SparkFrame":
        return SparkFrame(self.df.select(*[F.col(c).isNull().alias(c) for c in self.df.columns]))

    def dropna(self, how: str = "any", thresh: int | None = None, subset: Sequence[str] | None = None) -> "SparkFrame":
        return SparkFrame(self.df.na.drop(how=how, thresh=thresh, subset=list(subset) if subset else None))

    def fillna(self, value: Any | Mapping[str, Any]) -> "SparkFrame":
        return SparkFrame(self.df.na.fill(value if isinstance(value, dict) else value))

    def replace(self, to_replace, value=None, subset: Sequence[str] | None = None) -> "SparkFrame":
        return SparkFrame(self.df.na.replace(to_replace, value, subset=list(subset) if subset else None))

    # ---------------- ordered-window sugar (capability gain: the reference
    # raises on rolling/shift/resample — ScalableSeries.py:351-417) ---------
    _ROLL_FNS = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count, "std": F.stddev_samp}

    def rolling_agg(
        self,
        order_col: str,
        window_size: int,
        aggs: Mapping[str, str | list[str]],
        partition_by: Sequence[str] | None = None,
        min_periods: int = 1,
    ) -> "SparkFrame":
        """Trailing-window aggregates over the last ``window_size`` rows in
        ``order_col`` order (pandas rolling semantics: window includes the
        current row). ``aggs``: {col: fn or [fns]} with fn in mean/sum/min/
        max/count/std; outputs ``{col}_rolling_{fn}``. Without partition_by
        the global order is served by functions/prefix.global_rolling (range
        shuffle + trailing-k carry table) — fully parallel, no one-task
        WindowExec."""
        if not partition_by:
            from bears_spark.functions.prefix import global_rolling

            norm = {c: ([fns] if isinstance(fns, str) else list(fns)) for c, fns in aggs.items()}
            return SparkFrame(
                global_rolling(self.df, [order_col], norm, window_size, min_periods=min_periods)
            )
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(order_col)
            .rowsBetween(-(window_size - 1), 0)
        )
        df = self.df
        for c, fns in aggs.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                if fn not in self._ROLL_FNS:
                    raise ValueError(f"unsupported rolling agg {fn!r}")
                expr = self._ROLL_FNS[fn](F.col(c)).over(w)
                if min_periods > 1:
                    expr = F.when(F.count(F.col(c)).over(w) >= min_periods, expr)
                df = df.withColumn(f"{c}_rolling_{fn}", expr)
        return SparkFrame(df)

    _DURATION_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}

    @classmethod
    def _parse_duration(cls, duration: str | int | float) -> int:
        """'90s' / '15m' / '2h' / '7d' / '1w' (or a plain number of seconds)
        -> whole seconds."""
        if isinstance(duration, (int, float)):
            n = int(duration)
        else:
            text = str(duration).strip().lower()
            unit = text[-1]
            if unit not in cls._DURATION_UNITS:
                raise ValueError(
                    f"unsupported duration {duration!r} (use <n>[s|m|h|d|w])"
                )
            n = int(float(text[:-1]) * cls._DURATION_UNITS[unit])
        if n <= 0:
            raise ValueError(f"duration must be positive, got {duration!r}")
        return n

    def rolling_time_agg(
        self,
        ts_col: str,
        duration: str | int,
        aggs: Mapping[str, str | list[str]],
        partition_by: Sequence[str],
        min_periods: int = 1,
    ) -> "SparkFrame":
        """Trailing EVENT-TIME window aggregates: for each row, fn over the
        rows whose ``ts_col`` lies in the closed interval
        ``[t - duration, t]`` (inclusive both ends — unlike pandas
        ``rolling('7d')``, whose window is left-open). ``duration`` is
        ``'<n>[s|m|h|d|w]'`` or seconds. Compiles to a rangeBetween window
        on the epoch seconds — partition state is bounded by the densest
        duration-window per key, so ``partition_by`` is REQUIRED: a
        partition-less trailing-duration window has unbounded carry (any
        number of rows may share one window) and cannot use the prefix
        machinery's bounded offset tables."""
        if not partition_by:
            raise ValueError(
                "rolling_time_agg requires partition_by: an unpartitioned "
                "trailing-duration window has unbounded cross-partition "
                "carry; partition (e.g. by entity) or use resample()"
            )
        seconds = self._parse_duration(duration)
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(F.col(ts_col).cast("timestamp").cast("long"))
            .rangeBetween(-seconds, 0)
        )
        df = self.df
        for c, fns in aggs.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                if fn not in self._ROLL_FNS:
                    raise ValueError(f"unsupported rolling agg {fn!r}")
                expr = self._ROLL_FNS[fn](F.col(c)).over(w)
                if min_periods > 1:
                    expr = F.when(F.count(F.col(c)).over(w) >= min_periods, expr)
                df = df.withColumn(f"{c}_rolling_{fn}", expr)
        return SparkFrame(df)

    def shift(
        self,
        order_col: str,
        cols: Sequence[str],
        periods: int = 1,
        partition_by: Sequence[str] | None = None,
        suffix: str = "_shift",
    ) -> "SparkFrame":
        """pandas shift under an explicit order: positive periods lag (value
        from ``periods`` rows earlier), negative lead. Without partition_by
        the global order is served by functions/prefix.global_shift (row
        position + self-join) — fully parallel, no one-task WindowExec."""
        if not partition_by:
            from bears_spark.functions.prefix import global_shift

            return SparkFrame(global_shift(self.df, [order_col], list(cols), periods, suffix))
        w = Window.partitionBy(*partition_by).orderBy(order_col)
        df = self.df
        for c in cols:
            shifted = F.lag(F.col(c), periods).over(w) if periods >= 0 else F.lead(F.col(c), -periods).over(w)
            df = df.withColumn(f"{c}{suffix}", shifted)
        return SparkFrame(df)

    def resample(
        self,
        ts_col: str,
        freq: str,
        aggs: Mapping[str, str | list[str]],
        partition_by: Sequence[str] | None = None,
    ) -> "SparkFrame":
        """Time-bucket aggregation: ``freq`` is a date_trunc unit (minute/
        hour/day/week/month/year). Compiles to a plain groupBy on the
        truncated timestamp — map-side partial aggregation, no window."""
        bucket = F.date_trunc(freq, F.col(ts_col)).alias(ts_col)
        keys = ([*partition_by] if partition_by else []) + [bucket]
        exprs = []
        for c, fns in aggs.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                if fn not in self._ROLL_FNS:
                    raise ValueError(f"unsupported resample agg {fn!r}")
                exprs.append(self._ROLL_FNS[fn](F.col(c)).alias(f"{c}_{fn}"))
        return SparkFrame(self.df.groupBy(*keys).agg(*exprs))

    _CUM_FNS = {"sum": F.sum, "max": F.max, "min": F.min, "prod": F.product, "count": F.count}

    def cumagg(
        self,
        order_col: str,
        aggs: Mapping[str, str | list[str]],
        partition_by: Sequence[str] | None = None,
    ) -> "SparkFrame":
        """Cumulative (expanding) aggregates under an explicit order:
        cumsum/cummax/cummin/cumprod/cumcount as ``{col}_cum{fn}`` columns.
        (pandas cum* — in the reference's not-implemented set,
        ScalableSeries.py:351-417.)

        Scale: WITHOUT partition_by, sum/max/min/count route through
        functions/prefix.partitioned_scan (range partition + offset table,
        fully parallel — no one-task WindowExec). cumprod is the exception:
        its offset algebra is lossy in floats (overflow), so a global
        cumprod still runs the one-task window — partition it, or take
        exp(cumsum(log)) when the values are positive."""
        norm = {c: [fns] if isinstance(fns, str) else list(fns) for c, fns in aggs.items()}
        for c, fns in norm.items():
            for fn in fns:
                if fn not in self._CUM_FNS:
                    raise ValueError(f"unsupported cumulative agg {fn!r}")
        if not partition_by and all(fn != "prod" for fns in norm.values() for fn in fns):
            from bears_spark.functions.prefix import partitioned_scan

            return SparkFrame(partitioned_scan(self.df, [order_col], norm))
        w = (
            (Window.partitionBy(*partition_by) if partition_by else Window.partitionBy())
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        df = self.df
        for c, fns in norm.items():
            for fn in fns:
                df = df.withColumn(f"{c}_cum{fn}", self._CUM_FNS[fn](F.col(c)).over(w))
        return SparkFrame(df)

    def diff(
        self, order_col: str, cols: Sequence[str], periods: int = 1, partition_by: Sequence[str] | None = None
    ) -> "SparkFrame":
        """Row-to-row difference under explicit order (pandas diff). A
        partition-less global order goes through prefix.global_shift."""
        if not partition_by:
            from bears_spark.functions.prefix import global_shift

            out = global_shift(self.df, [order_col], list(cols), periods, suffix="__prev__")
            for c in cols:
                out = out.withColumn(f"{c}_diff", F.col(c) - F.col(f"{c}__prev__")).drop(f"{c}__prev__")
            return SparkFrame(out)
        w = Window.partitionBy(*partition_by).orderBy(order_col)
        df = self.df
        for c in cols:
            prev = F.lag(F.col(c), periods).over(w) if periods >= 0 else F.lead(F.col(c), -periods).over(w)
            df = df.withColumn(f"{c}_diff", F.col(c) - prev)
        return SparkFrame(df)

    def pct_change(
        self, order_col: str, cols: Sequence[str], periods: int = 1, partition_by: Sequence[str] | None = None
    ) -> "SparkFrame":
        """Fractional change vs the row ``periods`` earlier (pandas
        pct_change). A partition-less global order goes through
        prefix.global_shift."""
        if not partition_by:
            from bears_spark.functions.prefix import global_shift

            out = global_shift(self.df, [order_col], list(cols), periods, suffix="__prev__")
            for c in cols:
                out = out.withColumn(f"{c}_pct_change", F.col(c) / F.col(f"{c}__prev__") - 1).drop(
                    f"{c}__prev__"
                )
            return SparkFrame(out)
        w = Window.partitionBy(*partition_by).orderBy(order_col)
        df = self.df
        for c in cols:
            prev = F.lag(F.col(c), periods).over(w)
            df = df.withColumn(f"{c}_pct_change", F.col(c) / prev - 1)
        return SparkFrame(df)

    def rank(
        self,
        order_col: str,
        method: str = "min",
        ascending: bool = True,
        partition_by: Sequence[str] | None = None,
        out_col: str = "rank",
    ) -> "SparkFrame":
        """Rank rows by ``order_col`` (pandas rank methods min/dense/first).
        A partition-less global rank goes through prefix.distributed_rank
        (distinct-value reduction + prefix machinery, no one-task window)."""
        fns = {"min": F.rank, "dense": F.dense_rank, "first": F.row_number}
        if method not in fns:
            raise ValueError(f"unsupported rank method {method!r}")
        if not partition_by:
            from bears_spark.functions.prefix import distributed_rank

            return SparkFrame(
                distributed_rank(self.df, order_col, method=method, ascending=ascending, out_col=out_col)
            )
        order = F.asc(order_col) if ascending else F.desc(order_col)
        w = Window.partitionBy(*partition_by).orderBy(order)
        return SparkFrame(self.df.withColumn(out_col, fns[method]().over(w)))

    def ewm_mean(
        self,
        order_col: str,
        cols: Sequence[str],
        alpha: float,
        partition_by: Sequence[str] | None = None,
        adjust: bool = True,
    ) -> "SparkFrame":
        """Exponentially weighted mean (pandas ewm(alpha).mean()) as
        ``{col}_ewm``. The recursive formula doesn't decompose into an
        associative window aggregate, so this is the one ordered operator
        that runs as a grouped Arrow applyInPandas — per-partition pandas
        ewm over rows sorted by ``order_col``. Partition for parallelism:
        without ``partition_by`` all rows pass through one group."""
        import pandas as pd  # noqa: PLC0415 — worker-side import by design

        out_fields = ", ".join(f"{c}_ewm double" for c in cols)
        in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in self.df.schema.fields)
        schema = f"{in_fields}, {out_fields}"

        def _ewm(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_col)
            for c in cols:
                pdf[f"{c}_ewm"] = pdf[c].ewm(alpha=alpha, adjust=adjust).mean()
            return pdf

        if partition_by:
            grouped = self.df.groupBy(*partition_by)
        else:
            grouped = self.df.withColumn("__g__", F.lit(0)).groupBy("__g__")

        out = grouped.applyInPandas(lambda pdf: _ewm(pdf.drop(columns=["__g__"], errors="ignore")), schema)
        return SparkFrame(out)

    def ffill(self, order_col: str, cols: Sequence[str], partition_by: Sequence[str] | None = None) -> "SparkFrame":
        """Forward-fill needs an explicit ordering column in a distributed
        engine (ScalableSeries.py:1048-1091 has implicit row order). The
        partition-less global fill runs through prefix.partitioned_fill
        (range shuffle + cross-partition carry table — no one-task window)."""
        if not partition_by:
            from bears_spark.functions.prefix import partitioned_fill

            return SparkFrame(partitioned_fill(self.df, [order_col], list(cols)))
        w = Window.partitionBy(*partition_by).orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        df = self.df
        for c in cols:
            df = df.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
        return SparkFrame(df)

    def bfill(self, order_col: str, cols: Sequence[str], partition_by: Sequence[str] | None = None) -> "SparkFrame":
        """Backward-fill: first non-null looking forward under the order.
        The partition-less global fill is prefix.partitioned_fill with the
        order REVERSED (bfill(asc) == ffill(desc))."""
        if not partition_by:
            from bears_spark.functions.prefix import partitioned_fill

            return SparkFrame(partitioned_fill(self.df, [F.desc(order_col)], list(cols)))
        w = Window.partitionBy(*partition_by).orderBy(order_col).rowsBetween(
            0, Window.unboundedFollowing
        )
        df = self.df
        for c in cols:
            df = df.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
        return SparkFrame(df)

    # ---------------- sorting / sampling ----------------
    def sort_values(self, by: str | Sequence[str], ascending: bool | Sequence[bool] = True, na_position: str = "last") -> "SparkFrame":
        by = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(by) if isinstance(ascending, bool) else list(ascending)
        cols = []
        for c, a in zip(by, asc):
            if a:
                cols.append(F.asc_nulls_last(c) if na_position == "last" else F.asc_nulls_first(c))
            else:
                cols.append(F.desc_nulls_last(c) if na_position == "last" else F.desc_nulls_first(c))
        return SparkFrame(self.df.orderBy(*cols))

    def sample(self, n: int | None = None, frac: float | None = None, replace: bool = False, random_state: int | None = None) -> "SparkFrame":
        if frac is not None:
            return SparkFrame(self.df.sample(withReplacement=replace, fraction=frac, seed=random_state))
        if n is not None:
            # exact-n: seeded random order + limit (one shuffle; fine for feeds)
            return SparkFrame(self.df.orderBy(F.rand(random_state) if random_state is not None else F.rand()).limit(n))
        raise ValueError("sample requires n or frac")

    def shuffle(self, seed: int | None = None) -> "SparkFrame":
        """Seeded-deterministic within-engine (documented divergence from
        numpy RandomState bit-order, SURVEY.md §7 known-hard #3)."""
        return SparkFrame(self.df.orderBy(F.rand(seed) if seed is not None else F.rand()))

    # ---------------- function application ----------------
    def applymap(self, func: Callable, returnType: str = "string") -> "SparkFrame":
        udf = _elementwise_pandas_udf(func, returnType)
        return SparkFrame(self.df.select(*[udf(F.col(c)).alias(c) for c in self.df.columns]))

    def apply(self, func: Callable, axis: int = 1, schema=None) -> "SparkFrame":
        """Row-wise apply via mapInPandas (Arrow-batched; stays on executors)."""
        if axis != 1:
            raise ValueError("only axis=1 (row-wise) supported")
        out_schema = schema or self.df.schema

        def _fn(batches):
            for pdf in batches:
                yield func(pdf)

        return SparkFrame(self.df.mapInPandas(_fn, out_schema))

    def map_in_pandas(self, func: Callable, schema) -> "SparkFrame":
        return SparkFrame(self.df.mapInPandas(func, schema))

    # ---------------- materialization / layout edges ----------------
    def persist(self, wait: bool = False) -> "SparkFrame":
        self.df = self.df.persist()
        if wait:
            self.df.count()
        return self

    def unpersist(self) -> "SparkFrame":
        self.df = self.df.unpersist()
        return self

    def compute(self) -> pd.DataFrame:
        return self.to_pandas()

    @property
    def is_lazy(self) -> bool:
        return True

    def repartition(self, npartitions: int | None = None, nrows: int | None = None, by: Sequence[str] | None = None) -> "SparkFrame":
        """nrows -> ceil(count/nrows) partitions (DaskScalableDataFrame.py:183-209)."""
        if by is not None:
            return SparkFrame(self.df.repartition(*(by if npartitions is None else [npartitions, *by])))
        if nrows is not None:
            import math

            npartitions = max(1, math.ceil(self.df.count() / nrows))
        return SparkFrame(self.df.repartition(npartitions))

    def to_pandas(self) -> pd.DataFrame:
        return self.df.toPandas()

    pandas = property(to_pandas)

    def to_list_of_dict(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.df.collect()]

    def to_dict(self) -> dict[str, list]:
        pdf = self.to_pandas()
        return {c: pdf[c].tolist() for c in pdf.columns}

    def collect(self):
        return self.df.collect()

    def to_parquet(self, path: str, **kw) -> None:
        from bears_spark.io.writer import write

        write(self, path, file_format="parquet", **kw)

    def to_csv(self, path: str, **kw) -> None:
        from bears_spark.io.writer import write

        write(self, path, file_format="csv", **kw)

    def to_json(self, path: str, **kw) -> None:
        from bears_spark.io.writer import write

        write(self, path, file_format="jsonlines", **kw)

    def to_npz(self, path: str, **kw) -> None:
        """ScalableDataFrame.to_npz parity (ScalableDataFrame.py:2006-2017) —
        driver-side single archive; use write(num_chunks=) for distributed."""
        from bears_spark.io.writer import write

        write(self, path, file_format="npz", **kw)

    # ---------------- reference-compat surface ----------------
    # Thin aliases + small ops so a reference (bears) user's call sites work
    # verbatim. Layout predicates/conversions (is_dask/as_layout/...) are
    # deliberately out of scope — Spark has exactly one layout (SURVEY §1.2).
    def tail(self, n: int, order_by: str | Sequence[str]) -> "SparkFrame":
        """Last n rows under an EXPLICIT order (the reference's tail assumes
        an implicit row order; a distributed frame has none). Executes as a
        reversed TakeOrderedAndProject — no global sort."""
        by = [order_by] if isinstance(order_by, str) else list(order_by)
        rev = self.df.orderBy(*[F.col(c).desc() for c in by]).limit(n)
        return SparkFrame(rev.orderBy(*by))

    def corr_matrix(self, *cols: str) -> pd.DataFrame:
        """Pairwise Pearson correlation matrix over numeric columns, computed
        in ONE aggregation pass (all column pairs as agg expressions — one
        scan, partial-aggregated; never a per-pair job). Built from
        try_divide(covar_pop, sqrt(var_pop*var_pop)) rather than F.corr so a
        constant column yields NaN (pandas parity) instead of the ANSI-mode
        DIVIDE_BY_ZERO error."""

        def _corr(a, b):
            return F.try_divide(F.covar_pop(a, b), F.sqrt(F.var_pop(a) * F.var_pop(b)))

        return self._pairwise(_corr, list(cols))

    def cov_matrix(self, *cols: str) -> pd.DataFrame:
        """Pairwise sample covariance matrix — same one-pass shape."""
        return self._pairwise(F.covar_samp, list(cols))

    def _pairwise(self, fn, cols: list[str]) -> pd.DataFrame:
        import numpy as np

        target = cols or [
            f.name for f in self.df.schema.fields if f.dataType.typeName() in ("long", "integer", "double", "float", "short")
        ]
        exprs = [fn(a, b).alias(f"{i}_{j}") for i, a in enumerate(target) for j, b in enumerate(target) if i <= j]
        row = self.df.agg(*exprs).first()
        m = np.zeros((len(target), len(target)))
        for i in range(len(target)):
            for j in range(len(target)):
                v = row[f"{min(i, j)}_{max(i, j)}"]
                # null aggregate (constant column, empty frame) -> NaN,
                # matching pandas corr/cov
                m[i, j] = np.nan if v is None else v
        return pd.DataFrame(m, index=target, columns=target)

    def update(self, other: "SparkFrame | DataFrame", on: str | Sequence[str]) -> "SparkFrame":
        """pandas df.update parity under an explicit key: for every column
        both sides share, non-null values from ``other`` overwrite ours.
        One left join on the key — the mirror image of combine_first."""
        odf = other.df if isinstance(other, SparkFrame) else other
        keys = [on] if isinstance(on, str) else list(on)
        shared = [c for c in self.df.columns if c in odf.columns and c not in keys]
        right = odf.select(*keys, *[F.col(c).alias(f"__u_{c}__") for c in shared])
        out = self.df.join(right, on=keys, how="left")
        for c in shared:
            out = out.withColumn(c, F.coalesce(F.col(f"__u_{c}__"), F.col(c)))
        return SparkFrame(out.drop(*[f"__u_{c}__" for c in shared]))

    @property
    def empty(self) -> bool:
        return self.df.isEmpty()

    @property
    def ndim(self) -> int:
        return 2

    def copy(self) -> "SparkFrame":
        return SparkFrame(self.df)  # plans are immutable — no data copy

    def items(self):
        for c in self.df.columns:
            yield c, self[c]

    @property
    def loc(self) -> "_LocIndexer":
        return _LocIndexer(self)

    # conversion aliases (reference as_* spellings); all driver-side collects
    # by contract, same as the reference's non-lazy layouts
    def as_pandas(self) -> pd.DataFrame:
        return self.to_pandas()

    def as_dict(self) -> dict[str, list]:
        return self.to_dict()

    def as_list_of_dict(self) -> list[dict]:
        return self.to_list_of_dict()

    def to_numpy(self, *cols: str):
        return (self.df.select(*cols) if cols else self.df).toPandas().to_numpy()

    def to_set(self, col: str) -> set:
        return {r[0] for r in self.df.select(col).distinct().collect()}

    def to_tensor(self, backend: str = "numpy", *cols: str) -> dict:
        """Whole-frame tensor conversion (TensorScalableSeries parity) —
        driver-side; for batched training feeds use tensor_bridge.tensor_stream."""
        from bears_spark.tensor_bridge import as_tensors

        import numpy as np

        pdf = (self.df.select(*cols) if cols else self.df).toPandas()
        return as_tensors({c: pdf[c].to_numpy() for c in pdf.columns}, backend=backend)

    def compress(self, codec: str = "gzip", base64: bool = False) -> bytes | str:
        from bears_spark.compress import compress

        return compress(self, codec=codec, base64=base64)

    def merge_asof(
        self,
        other: "SparkFrame | DataFrame",
        on: str,
        by: str | None = None,
        direction: str = "backward",
        allow_exact_matches: bool = True,
        tolerance_us: int | None = None,
        suffix: str = "_asof",
    ) -> "SparkFrame":
        """pandas merge_asof, frame-spelled — delegates to
        functions/temporal.asof_join (union+window plan, one shuffle)."""
        from bears_spark.functions.temporal import asof_join

        odf = other.df if isinstance(other, SparkFrame) else other
        return SparkFrame(
            asof_join(
                self.df,
                odf,
                on=on,
                by=by,
                direction=direction,
                allow_exact_matches=allow_exact_matches,
                tolerance_us=tolerance_us,
                suffix=suffix,
            )
        )

    # ---------------- streaming feed ----------------
    def stream(self, **kw):
        from bears_spark.stream import stream_frame

        return stream_frame(self, **kw)

    # ---------------- misc ----------------
    def valid(self, validator: Callable[[pd.DataFrame], "pd.Series"], sample_frac: float | None = None) -> bool:
        """Sampled element-wise validation (ScalableDataFrame.valid :298-334):
        validator gets pandas batches, returns boolean Series; True iff all pass."""
        df = self.df.sample(fraction=sample_frac) if sample_frac else self.df

        def _check(batches):
            for pdf in batches:
                ok = validator(pdf)
                yield pd.DataFrame({"bad": [int((~ok).sum())]})

        import pyspark.sql.types as T

        bad = df.mapInPandas(_check, T.StructType([T.StructField("bad", T.LongType())])).agg(F.sum("bad").alias("bad")).first()["bad"]
        return (bad or 0) == 0

    def pivot(self, index: str, columns: str, values: str, aggfunc: str = "sum", pivot_values: list | None = None) -> "SparkFrame":
        """pivot_table (raises in the reference, ScalableDataFrame.py:1421 —
        capability gain). Pass ``pivot_values`` when known: skips the extra
        distinct-scan job and keeps the plan a single aggregation."""
        g = self.df.groupBy(index)
        p = g.pivot(columns, pivot_values) if pivot_values else g.pivot(columns)
        return SparkFrame(p.agg(_GroupBy._FN[aggfunc](F.col(values))))

    def melt(self, id_vars: Sequence[str], value_vars: Sequence[str], var_name: str = "variable", value_name: str = "value") -> "SparkFrame":
        """unpivot (melt raises in the reference — capability gain)."""
        return SparkFrame(self.df.unpivot(list(id_vars), list(value_vars), var_name, value_name))

    def iloc_range(self, start: int, stop: int, order_by: str | Sequence[str]) -> "SparkFrame":
        """Positional row slice under an EXPLICIT order (distributed frames
        have no implicit row order — the reference's iloc assumes one;
        we require the caller to name it). Half-open [start, stop).

        Positions come from functions/prefix.distributed_row_number — range
        partition + offset table — NOT a global window, so the slice stays
        parallel at any input size."""
        from bears_spark.functions.prefix import distributed_row_number

        by = [order_by] if isinstance(order_by, str) else list(order_by)
        numbered = distributed_row_number(self.df, by)
        return SparkFrame(
            numbered.filter((F.col("__pos__") >= start) & (F.col("__pos__") < stop)).drop("__pos__")
        )

    def profile(self, *cols: str, distinct_rsd: float = 0.05) -> pd.DataFrame:
        """One-pass column profile: count / nulls / approx-distinct / min /
        max (+ mean/std for numerics), ALL columns in a SINGLE aggregation —
        one scan + one tiny reduce regardless of table size, unlike
        per-column describe loops. Returns a pandas frame (one row per
        column) — the profile is bounded by #columns, never by #rows."""
        fields = [f for f in self.df.schema.fields if not cols or f.name in cols]
        numeric = {"long", "integer", "double", "float", "short", "byte", "decimal"}
        exprs: list = []
        for f in fields:
            c = f.name
            exprs += [
                F.count(F.col(c)).alias(f"{c}__n"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
                F.approx_count_distinct(c, rsd=distinct_rsd).alias(f"{c}__distinct"),
            ]
            if f.dataType.typeName() in numeric:
                exprs += [
                    F.min(c).alias(f"{c}__min"),
                    F.max(c).alias(f"{c}__max"),
                    F.mean(c).alias(f"{c}__mean"),
                    F.stddev_samp(c).alias(f"{c}__std"),
                ]
            elif f.dataType.typeName() in ("string", "date", "timestamp", "timestamp_ntz"):
                exprs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
        row = self.df.agg(*exprs).first()
        out = []
        for f in fields:
            c = f.name
            rec = {
                "column": c,
                "dtype": f.dataType.simpleString(),
                "count": row[f"{c}__n"],
                "nulls": row[f"{c}__nulls"],
                "approx_distinct": row[f"{c}__distinct"],
                "min": row.asDict().get(f"{c}__min"),
                "max": row.asDict().get(f"{c}__max"),
                "mean": row.asDict().get(f"{c}__mean"),
                "std": row.asDict().get(f"{c}__std"),
            }
            out.append(rec)
        return pd.DataFrame(out)

    def describe(self, *cols: str) -> pd.DataFrame:
        """summary() stats for numeric columns (count/mean/std/min/quartiles/max)."""
        target = list(cols) or [
            f.name for f in self.df.schema.fields if f.dataType.typeName() in ("long", "integer", "double", "float", "short")
        ]
        return self.df.select(*target).summary().toPandas()

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    def __repr__(self) -> str:
        return f"SparkFrame[{', '.join(f'{f.name}: {f.dataType.simpleString()}' for f in self.df.schema.fields)}]"


class _LocIndexer:
    """Minimal pandas .loc: ``df.loc[mask]`` and ``df.loc[mask, cols]``
    (boolean-mask row selection + column projection — the shapes reference
    call sites actually use; label-based row loc needs an index, which a
    distributed frame doesn't have)."""

    def __init__(self, frame: SparkFrame):
        self._frame = frame

    def __getitem__(self, key):
        if isinstance(key, tuple):
            mask, cols = key
            cols = [cols] if isinstance(cols, str) else list(cols)
            return self._frame[mask][cols]
        return self._frame[key]


# reference-spelling aliases (kept outside the class body so each points at
# the canonical def without forward references)
SparkFrame.aggregate = SparkFrame.agg
SparkFrame.isnull = SparkFrame.isna
SparkFrame.notna = lambda self: SparkFrame(self.df.select(*[F.col(c).isNotNull().alias(c) for c in self.df.columns]))
SparkFrame.notnull = SparkFrame.notna
SparkFrame.backfill = SparkFrame.bfill
SparkColumn.kurtosis = SparkColumn.kurt
SparkColumn.tolist = lambda self: self.to_pandas().tolist()
SparkColumn.to_list = SparkColumn.tolist
