"""Source-level discipline gates: the anti-patterns that silently kill
a plan at 100 TB must fail review here, not be re-found by a human
each round.

These mirror the per-round audit: no row-at-a-time Python UDFs (every
Python kernel must be Arrow-batched), no RDD API in the DataFrame
engine, no driver-side re-parallelize.  Comments/docstrings are
stripped before matching so prose ABOUT an anti-pattern stays legal.
"""

from __future__ import annotations

import ast
import io
import pathlib
import re
import tokenize

PKG = pathlib.Path(__file__).resolve().parent.parent / "bigdata_assigment3_spark"


def _code_only(path: pathlib.Path) -> str:
    """Source with comments and docstrings removed."""
    src = path.read_text()
    out = []
    prev_end = (1, 0)
    toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    doc_ranges = []
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)):
            body = getattr(node, "body", [])
            if body and isinstance(body[0], ast.Expr) and isinstance(
                body[0].value, ast.Constant
            ) and isinstance(body[0].value.value, str):
                doc_ranges.append((body[0].lineno, body[0].end_lineno))
    for tok in toks:
        if tok.type == tokenize.COMMENT:
            continue
        if tok.type == tokenize.STRING and any(
            a <= tok.start[0] <= b for a, b in doc_ranges
        ):
            continue
        out.append(tok.string)
    return " ".join(out)


def _scan(pattern: str) -> list[str]:
    rx = re.compile(pattern)
    hits = []
    for path in sorted(PKG.rglob("*.py")):
        if rx.search(_code_only(path)):
            hits.append(str(path.relative_to(PKG)))
    return hits


def test_no_row_at_a_time_python_udf():
    """F.udf / pandas-free udf() is the 10-100x slow path; every Python
    kernel must go through pandas_udf / mapInPandas / applyInPandas /
    mapInArrow."""
    assert _scan(r"\bF\s*\.\s*udf\s*\(") == []
    assert _scan(r"(?<!pandas_)\budf\s*\(\s*lambda") == []


def test_no_rdd_api():
    """RDDs bypass Catalyst entirely — nothing in the engine may drop
    to them (imperative per-partition logic goes through mapInPandas)."""
    assert _scan(r"\.\s*rdd\b") == []
    assert _scan(r"\bparallelize\s*\(") == []


def test_no_pandas_collect_in_engine():
    """toPandas() on an unbounded DataFrame is a driver OOM at scale;
    the engine never materializes results driver-side (tests may)."""
    assert _scan(r"\.\s*toPandas\s*\(") == []
