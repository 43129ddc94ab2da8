"""Graded queries that exercise the PROCESSOR / PIPELINE / FRAME surfaces —
each runs the actual library machinery (DataPipeline, LabelEncoding, merge)
and is verified against an independent DuckDB SQL re-implementation of the
same semantics. This puts the fit/transform layer itself under the driver's
correctness gate, not just unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bears_spark.frame import SparkFrame
from bears_spark.pipeline import DataPipeline, PipelineStepConfig
from bears_spark.queries.tables import load_table


# --------------------------------------------------------------------------
# pipeline_text_clean: a 3-step DataPipeline (lowercase -> punctuation strip
# -> html strip) + token count, end to end through the pipeline executor.
def pipeline_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pipe = DataPipeline(
        [
            PipelineStepConfig(input="text", transformer="case", output="t1", params={"case": "lower"}),
            PipelineStepConfig(input="t1", transformer="striphtml", output="t2"),
            PipelineStepConfig(input="t2", transformer="punctuationcleaner", output="t3", params={"replacement": " "}),
        ]
    )
    out = pipe.fit_transform(docs)
    from bears_spark.functions.text import token_count

    return out.select(
        "doc_id",
        F.length("t3").alias("clean_len"),
        token_count("t3").alias("n_tokens"),
    ).orderBy("doc_id")


# DuckDB mirror: lower -> strip <.*?> -> replace ASCII punctuation with space
_PUNCT_CLASS = r"""[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""

PIPELINE_TEXT_CLEAN_SQL = f"""
WITH cleaned AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(lower(text), '<.*?>', '', 'g'), '{_PUNCT_CLASS}', ' ', 'g') AS t3
  FROM documents
)
SELECT doc_id, length(t3) AS clean_len,
       len(list_filter(regexp_split_to_array(trim(t3), '\\s+'), x -> x <> '')) AS n_tokens
FROM cleaned ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# lang_label_encode: LabelEncoding fit+transform (np.unique sort order,
# one_to_n range) — oracle = dense_rank over sorted distinct labels.
def lang_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bears_spark.processor.categorical import LabelEncoding

    docs = load_table(spark, sf_dir, "documents")
    enc = LabelEncoding(encoding_range="one_to_n")
    enc.fit(docs, ["lang"])
    return enc.apply(docs, "lang", "lang_code").select("doc_id", "lang", "lang_code").orderBy("doc_id")


LANG_LABEL_ENCODE_SQL = """
SELECT doc_id, lang, dense_rank() OVER (ORDER BY lang) AS lang_code
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# value_mean_imputation: NumericMissingValueImputation(mean) over a column
# with deterministically-injected nulls (error events) — oracle computes the
# same train-time mean and coalesce.
def value_mean_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bears_spark.processor.numeric import NumericMissingValueImputation

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(F.col("value"))
    )
    imp = NumericMissingValueImputation(strategy="mean")
    imp.fit(ev, ["v"])
    return (
        imp.apply(ev, "v", "v_filled")
        .select("event_id", F.round("v_filled", 6).alias("v_filled"))
        .orderBy("event_id")
    )


VALUE_MEAN_IMPUTATION_SQL = """
WITH masked AS (
  SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v FROM events
), m AS (SELECT avg(v) AS mean_v FROM masked)
SELECT event_id, round(coalesce(v, mean_v), 6) AS v_filled
FROM masked, m ORDER BY event_id
"""


# --------------------------------------------------------------------------
# merge_indicator_counts: SparkFrame.merge(outer, indicator=True) provenance
# counts — pandas-merge semantics under the gate.
def merge_indicator_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = SparkFrame(
        load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    )
    # acctbal filter drops some nations from the supplier side so all three
    # provenance categories appear in the result
    supp = SparkFrame(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    merged = cust.merge(supp, on="nationkey", how="outer", indicator=True)
    return merged.df.groupBy("_merge").agg(F.count("*").alias("n")).orderBy("_merge")


MERGE_INDICATOR_SQL = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000),
     j AS (
       SELECT CASE WHEN c.nationkey IS NOT NULL AND s.nationkey IS NOT NULL THEN 'both'
                   WHEN c.nationkey IS NOT NULL THEN 'left_only'
                   ELSE 'right_only' END AS _merge
       FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
     )
SELECT _merge, count(*) AS n FROM j GROUP BY _merge ORDER BY _merge
"""

QUERIES = {
    "pipeline_text_clean": pipeline_text_clean,
    "lang_label_encode": lang_label_encode,
    "value_mean_imputation": value_mean_imputation,
    "merge_indicator_counts": merge_indicator_counts,
}

ORACLES = {
    "pipeline_text_clean": PIPELINE_TEXT_CLEAN_SQL,
    "lang_label_encode": LANG_LABEL_ENCODE_SQL,
    "value_mean_imputation": VALUE_MEAN_IMPUTATION_SQL,
    "merge_indicator_counts": MERGE_INDICATOR_SQL,
}
