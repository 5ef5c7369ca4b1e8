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


# --------------------------------------------------------------------
# SF-growing broadcast gate (round-8, VERDICT r7 item 2): F.broadcast
# of a side whose row count grows with the corpus is an executor OOM
# at 100 TB.  The scanner traces each F.broadcast argument back through
# same-function assignments (plus same-module helpers/constants) and
# flags provenance that touches an SF-scaled source without any
# bounding construct.  Bounding = .limit / spark.range / literal
# createDataFrame / region-nation dims / a 1-row global aggregate /
# an enum-keyed aggregate / an explicit bounded_broadcast waiver
# (those call sites are pinned below, so adding one is a reviewed
# change).

_SCALED_RE = re.compile(
    r"load_table\s*\([^)]*[\"'](?:customer|supplier|part|orders|lineitem"
    r"|events|documents|embeddings)[\"']"
    r"|_docs_parallel\s*\(|_shingles_df\s*\(|\bq_\w+\s*\("
    r"|customer_priority_history\s*\(|readStream"
)
_BOUNDED_RE = re.compile(
    r"\.\s*limit\s*\(|\.\s*range\s*\(|createDataFrame\s*\(|bounded_broadcast\s*\("
    r"|load_table\s*\([^)]*[\"'](?:region|nation)[\"']"
)
# columns whose cardinality is structurally bounded (enum codes, sketch
# coordinates, band/centroid ids) — an aggregate keyed ONLY by these
# yields a constant-size result at any SF
_ENUM_KEYS = {
    "event_type", "source", "lang", "priority", "prev_type", "label",
    "depth", "bucket", "sub_id", "code", "list_id", "band",
}
_GROUPBY_RE = re.compile(r"groupBy\s*\(([^)]*)\)")
_KEY_RE = re.compile(r"[\"'](\w+)[\"']")


def _segment_bounded(seg: str, refs_grouped_data: bool) -> bool:
    if _BOUNDED_RE.search(seg):
        return True
    # global aggregate (exactly one row) — but NOT when the segment
    # references a name holding a bare GroupedData: `g = df.groupBy(k);
    # x = g.agg(...)` is a per-key aggregate split across assignments,
    # the evasion a single-chain text check misses
    if ".agg(" in seg and "groupBy" not in seg and not refs_grouped_data:
        return True
    for m in _GROUPBY_RE.finditer(seg):
        keys = _KEY_RE.findall(m.group(1))
        if keys and all(k in _ENUM_KEYS for k in keys):
            return True
    return False


def _broadcast_violations(src: str, rel: str) -> list[str]:
    tree = ast.parse(src)
    funcs: dict[str, ast.AST] = {}
    consts: dict[str, ast.AST] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[node.name] = node
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    consts[t.id] = node.value
    def _is_grouped_data(rhs: ast.AST) -> bool:
        """RHS leaves a bare GroupedData (groupBy/rollup/cube/pivot not
        consumed by .agg in the same expression)."""
        return (
            isinstance(rhs, ast.Call)
            and isinstance(rhs.func, ast.Attribute)
            and rhs.func.attr in {"groupBy", "groupby", "rollup", "cube", "pivot"}
        )

    out = []
    for fn in [n for n in ast.walk(tree)
               if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]:
        local: dict[str, list[ast.AST]] = {}
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        local.setdefault(t.id, []).append(node.value)
        grouped_names = {
            name
            for scope in (local, consts)
            for name, rhss in (
                scope.items() if scope is local
                else ((k, [v]) for k, v in scope.items())
            )
            for rhs in rhss
            if _is_grouped_data(rhs)
        }
        for node in ast.walk(fn):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and node.args
            ):
                continue
            # trace the argument: its own source plus the RHS of every
            # reachable assignment / same-module helper
            segments, seen, stack = [], set(), [node.args[0]]
            while stack:
                n = stack.pop()
                names = {x.id for x in ast.walk(n) if isinstance(x, ast.Name)}
                segments.append(
                    (ast.get_source_segment(src, n) or "",
                     bool(names & grouped_names))
                )
                for name in names:
                    if name in seen:
                        continue
                    seen.add(name)
                    stack.extend(local.get(name, []))
                    if name in funcs:
                        stack.append(funcs[name])
                    elif name in consts:
                        stack.append(consts[name])
            prov = "\n".join(s for s, _ in segments)
            if _SCALED_RE.search(prov) and not any(
                _segment_bounded(s, g) for s, g in segments
            ):
                out.append(f"{rel}:{node.lineno} in {fn.name}")
    return out


def test_no_sf_growing_broadcast():
    """Every F.broadcast whose provenance reaches an SF-scaled table
    must pass through a bounding construct; the two contract-bounded
    exceptions go through bounded_broadcast and are pinned below."""
    violations = []
    for path in sorted(PKG.rglob("*.py")):
        violations += _broadcast_violations(
            path.read_text(), str(path.relative_to(PKG))
        )
    assert violations == [], violations


def test_broadcast_gate_fires_on_bad_plan():
    """The scanner must actually catch the round-7 bug class: a forced
    broadcast of a per-document aggregate (one row per doc = SF-growing)
    — and must NOT fire once the side is explicitly bounded."""
    bad = (
        "def q(spark, sf_dir):\n"
        "    docs = load_table(spark, sf_dir, 'documents')\n"
        "    norms = docs.groupBy('doc_id').agg(F.sum('x').alias('n2'))\n"
        "    return docs.join(F.broadcast(norms), 'doc_id')\n"
    )
    assert _broadcast_violations(bad, "bad.py") == ["bad.py:4 in q"]
    good = bad.replace(".agg(F.sum('x').alias('n2'))",
                       ".agg(F.sum('x').alias('n2')).limit(10)")
    assert _broadcast_violations(good, "good.py") == []
    # split-chain evasion: a bare GroupedData assigned to its own name
    # must not launder the per-key aggregate into a "global" one
    split = (
        "def q(spark, sf_dir):\n"
        "    docs = load_table(spark, sf_dir, 'documents')\n"
        "    grp = docs.groupBy('doc_id')\n"
        "    norms = grp.agg(F.sum('x').alias('n2'))\n"
        "    return docs.join(F.broadcast(norms), 'doc_id')\n"
    )
    assert _broadcast_violations(split, "split.py") == ["split.py:5 in q"]
    # ...while a completed global aggregate referenced by name stays
    # bounded (x = big.agg(...) is one row however it is spelled)
    glob = (
        "def q(spark, sf_dir):\n"
        "    docs = load_table(spark, sf_dir, 'documents')\n"
        "    mx = docs.agg(F.max('x').alias('m'))\n"
        "    return docs.crossJoin(F.broadcast(mx))\n"
    )
    assert _broadcast_violations(glob, "glob.py") == []


def test_bounded_broadcast_waivers_pinned():
    """bounded_broadcast is a reviewed waiver, not a free pass: the set
    of call sites is pinned so a new one is a deliberate test edit."""
    sites = set()
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for fn in [n for n in ast.walk(tree)
                   if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]:
            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                    and node.func.id == "bounded_broadcast"
                ):
                    sites.add((str(path.relative_to(PKG)), fn.name))
    assert sites == {
        ("operators/similarity.py", "q_ann_cosine_topk"),
        ("operators/similarity.py", "q_ann_band_recall_tradeoff"),
        # round 12: the deterministic E2LSH / multi-assign IVF probe
        # sides — both bounded by the fixed 10-probe set at every SF
        ("operators/similarity.py", "q_ann_lsh_bucketed"),
        ("operators/similarity.py", "q_ann_ivf_probe"),
        ("operators/text.py", "q_bm25_topk_docs"),
        ("operators/text.py", "q_langid_char_ngram"),
        ("streaming/queries.py", "q_stream_pit_enrich"),
    }, sites
