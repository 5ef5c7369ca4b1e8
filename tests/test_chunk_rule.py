"""Invariants of the shared sliding-window chunk rule
(operators/text.py: CHUNK_TOKENS/CHUNK_STRIDE/chunk_spans), checked
over every document length 1..40 tokens — the three properties any
RAG chunker must hold, independent of the concrete constants:

1. coverage: every token position falls inside >=1 kept window;
2. non-redundancy: every kept window (beyond the first) contributes at
   least one token the previous kept window did not cover;
3. bounded width: no window exceeds CHUNK_TOKENS tokens.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_assigment3_spark.operators.text import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_spans,
)


def test_chunk_rule_invariants(spark):
    docs = spark.range(1, 41).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.col("id")), lambda i: i.cast("string")),
            " ",
        ).alias("text"),
    )
    rows = (
        chunk_spans(docs)
        .select("doc_id", "n", "start")
        .orderBy("doc_id", "start")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n in range(1, 41):
        spans = by_doc.get(n, [])
        assert spans, f"doc of {n} tokens produced no chunks"
        covered = set()
        prev_end = None
        for r in spans:
            end = min(r.start + CHUNK_TOKENS, n)
            assert end - r.start <= CHUNK_TOKENS
            if prev_end is not None:
                assert end > prev_end, (
                    f"n={n}: window at {r.start} adds no token beyond {prev_end}"
                )
            covered.update(range(r.start, end))
            prev_end = end
        assert covered == set(range(n)), f"n={n}: coverage gap {set(range(n)) - covered}"


def test_chunk_rule_suffix_drop_fires(spark):
    """The drop predicate must actually drop something: a doc whose
    last natural start is suffix-covered (e.g. n = CHUNK_TOKENS + 1
    with the default 16/8: starts 0, 8, 16 -> 16 is dropped since
    8 + 16 covers through token 23 > 17)."""
    n = CHUNK_TOKENS + 1
    docs = spark.range(1).select(
        F.lit(0).alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(n)), lambda i: i.cast("string")), " "
        ).alias("text"),
    )
    starts = [r.start for r in chunk_spans(docs).select("start").collect()]
    naive = list(range(0, n, CHUNK_STRIDE))
    assert len(starts) < len(naive), (starts, naive)
