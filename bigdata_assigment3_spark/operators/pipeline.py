"""The composed curation pipeline: one per-document keep/drop verdict
assembled from the quality gate, the bigram-LM score, and the dedup
canonicalization — the final table a corpus build materializes before
tokenization.

Oracle composition reuses the registered oracle texts of the
constituent queries as nested CTE subqueries (single source of truth:
if a constituent's semantics change, this oracle follows
automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import REGISTRY, query
from .curation import _DUCK_QUALITY_DOC_SQL, _quality_verdict_df, q_lm_bigram_score
from .dedup import q_dedup_canonical_docs


def _sub(name: str) -> str:
    """A registered query's oracle text, as a nestable subquery."""
    return REGISTRY[name].oracle


@query(
    "curation_pipeline_verdict",
    oracle=f"""
    WITH q AS ({_DUCK_QUALITY_DOC_SQL}),
    lm AS ({_sub("lm_bigram_score")}),
    canon AS ({_sub("dedup_canonical_docs")})
    SELECT q.doc_id,
           q.verdict,
           lm.mean_nll,
           COALESCE(NOT canon.is_survivor, FALSE) AS is_dup_loser,
           q.verdict = 'keep' AND NOT COALESCE(NOT canon.is_survivor, FALSE)
               AS final_keep
    FROM q
    LEFT JOIN lm ON lm.doc_id = q.doc_id
    LEFT JOIN canon ON canon.doc_id = q.doc_id
    """,
)
def q_curation_pipeline_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation decision: the C4/Gopher quality verdict,
    the LM quality score (informational), duplicate-cluster membership
    from MinHash-LSH canonicalization, and the final keep flag
    (quality 'keep' AND not a dup-cluster loser) — the materialized
    decision table that turns a raw crawl into a training corpus.

    Scale shape: three doc_id-keyed left joins over outputs that are
    each individually scale-safe; the decision itself adds no new
    shuffle class.  The dup side only carries docs that appear in
    verified pairs, so its join input is corpus-dup-rate-sized, not
    corpus-sized.
    """
    q = _quality_verdict_df(spark, sf_dir)
    lm = q_lm_bigram_score(spark, sf_dir).select("doc_id", "mean_nll")
    canon = q_dedup_canonical_docs(spark, sf_dir).select("doc_id", "is_survivor")
    is_dup_loser = F.coalesce(~F.col("is_survivor"), F.lit(False))
    return (
        q.join(lm, "doc_id", "left")
        .join(canon, "doc_id", "left")
        .select(
            "doc_id",
            "verdict",
            "mean_nll",
            is_dup_loser.alias("is_dup_loser"),
            ((F.col("verdict") == "keep") & ~is_dup_loser).alias("final_keep"),
        )
    )
