"""Deterministic sampling operators for training-data pipelines:
hash-based train/test splits and per-class stratified samples.

Random sampling (``df.sample``/``sampleBy``) is seed-stable within
Spark but NOT reproducible across engines or re-partitions; a
hash-of-key split is — the same row lands in the same split on any
engine, any cluster, any day, which is what dataset curation actually
needs (and what makes both operators fully oracle-checkable via the
portable md5-int56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_int56_duck, md5_int56_spark
from ..registry import query
from ..sources import load_table

TRAIN_PCT = 80        # hash % 100 < 80 -> train
STRATUM_QUOTA = 40    # rows kept per language in the stratified sample


@query(
    "train_test_split",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN {md5_int56_duck("CAST(doc_id AS VARCHAR)")} % 100 < {TRAIN_PCT}
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n
    FROM tagged GROUP BY split, lang
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {TRAIN_PCT}/{100 - TRAIN_PCT} train/test split by
    key hash, reported as per-split per-language counts (the class-
    balance check every dataset build logs).

    The split is a pure projection — no shuffle, no state, appendable:
    new rows get a stable assignment without reshuffling old ones,
    which seeded random sampling cannot promise."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(md5_int56_spark("CAST(doc_id AS STRING)"))
    split = F.when(h % 100 < TRAIN_PCT, "train").otherwise("test")
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "stratified_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY {md5_int56_duck("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
    FROM ranked WHERE rn <= {STRATUM_QUOTA}
    GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with exact per-class quotas: rank rows
    within each language by key hash (a deterministic shuffle order)
    and keep the first {STRATUM_QUOTA} — balanced class representation
    with reproducible membership, vs `sampleBy` which gives only
    expected fractions and engine-local randomness.  The sum/min of
    sampled ids in the output pins the exact membership, not just the
    counts.

    Scale shape: one rank window per stratum; for heavily skewed
    strata the same pattern runs as groupBy(lang) + min_by(array) or
    a two-phase top-k."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(md5_int56_spark("CAST(doc_id AS STRING)"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_QUOTA)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_ids"),
        )
    )


K_FOLDS = 5


@query(
    "kfold_assignment",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
             {md5_int56_duck("CAST(doc_id AS VARCHAR)")} % {K_FOLDS} AS fold
      FROM documents
    )
    SELECT CAST(fold AS BIGINT) AS fold, lang, COUNT(*) AS n
    FROM tagged GROUP BY fold, lang
    """,
)
def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K_FOLDS}-fold cross-validation assignment by key hash,
    reported as per-fold per-language counts.  Same contract as the
    train/test split: a pure projection, append-stable, identical on
    any engine — and the fold of a row never changes when the corpus
    grows, so CV runs are comparable across dataset versions."""
    docs = load_table(spark, sf_dir, "documents")
    fold = F.expr(md5_int56_spark("CAST(doc_id AS STRING)")) % K_FOLDS
    return (
        docs.select(fold.cast("bigint").alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
