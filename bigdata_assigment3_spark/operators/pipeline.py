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
from ..sources import load_table
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


def _rag_oracle() -> str:
    from .text import CHUNK_TOKENS, chunk_spans_sql

    return f"""
    -- the retrieval-side capstone: the SHARED chunk rule (constants
    -- and CTE text from operators.text, so this census can't drift
    -- from the chunker it mirrors) + exact chunk-level dup census +
    -- an embedding norm from the aligned embeddings table, folded
    -- into one per-doc indexing verdict.
    WITH {chunk_spans_sql()},
    chunks AS (
        SELECT doc_id,
               array_to_string(list_slice(toks, start + 1,
                                          start + {CHUNK_TOKENS}), ' ') AS chunk_text
        FROM chunk_s
    ),
    occ AS (
        SELECT chunk_text, COUNT(*) AS n_occ FROM chunks GROUP BY chunk_text
    ),
    per_doc AS (
        SELECT c.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN o.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
        FROM chunks c JOIN occ o USING (chunk_text)
        GROUP BY c.doc_id
    ),
    emb AS (
        -- micro-unit integer fold: FLOOR(|x| * 1e6) is identical IEEE
        -- arithmetic in both engines (float->decimal cast rounding is
        -- not), and the BIGINT sum is order-independent.
        SELECT e.vec_id AS doc_id,
               CAST(SUM(CAST(FLOOR(ABS(CAST(u.x AS DOUBLE)) * 1000000) AS BIGINT))
                 AS BIGINT) AS emb_l1_micro,
               ANY_VALUE(e.label) AS cluster_label
        FROM embeddings e, UNNEST(e.embedding) AS u(x)
        GROUP BY e.vec_id
    )
    SELECT p.doc_id, p.n_chunks, p.n_dup_chunks,
           emb.emb_l1_micro, CAST(emb.cluster_label AS INTEGER) AS cluster_label,
           p.n_chunks >= 2 AND p.n_dup_chunks * 2 <= p.n_chunks AS index_keep
    FROM per_doc p JOIN emb USING (doc_id)
    ORDER BY p.doc_id
    """


@query("rag_chunk_index", oracle=_rag_oracle())
def q_rag_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval-side capstone (the RAG twin of
    ``curation_pipeline_verdict``): corpus-wide sliding-window chunking,
    an exact chunk-level duplicate census, and the aligned embedding's
    L1 norm + cluster label, composed into one per-document indexing
    verdict (enough unique chunks → worth indexing).

    Scale shape: the chunk stream is generated in the scan stage and
    aggregated by chunk_text hash — one shuffle proportional to the
    chunk count; the dup census joins back by the same key (no pair
    explosion — this is the exact-dedup pattern applied at chunk
    granularity); the embedding fold is a narrow map over the aligned
    table, DECIMAL-exact so the fold order can't drift the sum.
    """
    from .text import CHUNK_TOKENS, chunk_spans

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_spans(docs).select(
        "doc_id",
        F.array_join(F.slice("toks", F.col("start") + 1, CHUNK_TOKENS), " ").alias("chunk_text"),
    )
    occ = chunks.groupBy("chunk_text").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        chunks.join(occ, "chunk_text")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_chunks"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.aggregate(
            "embedding",
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + F.floor(F.abs(x.cast("double")) * 1000000).cast("bigint"),
        ).alias("emb_l1_micro"),
        F.col("label").cast("int").alias("cluster_label"),
    )
    return (
        per_doc.join(emb, "doc_id")
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            "emb_l1_micro",
            "cluster_label",
            ((F.col("n_chunks") >= 2) & (F.col("n_dup_chunks") * 2 <= F.col("n_chunks"))).alias(
                "index_keep"
            ),
        )
        .orderBy("doc_id")
    )
