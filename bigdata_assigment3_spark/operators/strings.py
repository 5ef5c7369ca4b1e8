"""String-similarity operators: edit-distance fuzzy matching with
block-bounded self-joins.

The reference validates and normalizes strings imperatively
(Rest_webservice/app/security.py email checks, app/services.py key
building); fuzzy matching is the analytic extension a reference user
needs for entity resolution over the same string columns.

Scale note: the join is blocked (grouped by p_brand), never a free
cross product — the worst case is sum over blocks of |block|², the
standard blocking-key bound for record linkage at scale.  Levenshtein
runs JVM-side (built-in `levenshtein`), no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..sources import load_table


@query(
    "fuzzy_part_match",
    oracle="""
    WITH pairs AS (
      SELECT a.p_brand,
             levenshtein(a.p_name, b.p_name) AS lev
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN lev <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
           CAST(MIN(lev) AS BIGINT) AS min_lev,
           CAST(SUM(lev) AS BIGINT) AS sum_lev
    FROM pairs GROUP BY p_brand
    """,
)
def q_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match of part names: per-brand pair counts at
    edit distance ≤ 4, plus min/total distance (all-integer outputs, so
    the oracle hash is exact).

    The brand column is the blocking key: pairs are only generated
    within a brand (shuffle on p_brand, pair generation local to each
    block), which is how record linkage stays feasible at 100 TB —
    never an unblocked cross join.  `levenshtein` evaluates inside
    whole-stage codegen.
    """
    p = load_table(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_name")
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.col("a.p_brand").alias("p_brand"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("lev"),
    )
    return pairs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("lev") <= 4, 1).otherwise(0)).cast("bigint").alias("n_close"),
        F.min("lev").cast("bigint").alias("min_lev"),
        F.sum("lev").cast("bigint").alias("sum_lev"),
    )


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS upper_name,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           REPLACE(p_name, ' ', '_') AS snake_name,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           CAST(STRPOS(p_name, ' ') AS BIGINT) AS space_pos,
           SPLIT_PART(p_name, ' ', 1) AS first_token,
           REVERSE(SPLIT_PART(p_name, ' ', -1)) AS rev_last_token,
           SUBSTRING(p_name, 2, 3) AS mid3,
           CONCAT(p_brand, ':', p_type) AS brand_type
    FROM part
    WHERE p_partkey % 37 = 0
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery (F11 beyond text_quality):
    upper/lpad/replace/length/instr/split/reverse/substring/concat —
    every one a JVM built-in, value-checked against the DuckDB
    equivalents on a deterministic key sample.
    """
    p = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.filter(F.col("p_partkey") % 37 == 0).select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.instr(F.col("p_name"), " ").cast("bigint").alias("space_pos"),
        F.element_at(toks, 1).alias("first_token"),
        F.reverse(F.element_at(toks, -1)).alias("rev_last_token"),
        F.substring("p_name", 2, 3).alias("mid3"),
        F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )
