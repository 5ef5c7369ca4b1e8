"""Hough circle detection as relational image analytics
(reference: HOUGH Transform/hough_heart_detector.py, *2.py).

The reference's pipeline is decode → Canny → fixed-radius circle vote
(dense np.int32 accumulator + 3x3 dilate-NMS + argmax).  Here the edge
map is a *point table* ``edge_points(image_id, y, x)`` and the
accumulator is never materialized: votes are rows, accumulation is a
groupBy-count (SURVEY A10), NMS is a neighborhood max join (W3), the
peak is a deterministic rank-1 (A11).

Fixture: planted circles (integer annulus — no trig, so Spark and the
DuckDB oracle agree bit-for-bit) + deterministic sparse noise; the
last image is noise-only to exercise the NO_CIRCLE path
(hough_heart_detector.py:150-151,192-194).

Scale notes: votes are (image_id, y0, x0) rows — ~2.(2r+1) per edge
point — aggregated immediately (map-side combine) before anything
wide; everything partitions by image_id, so 10^9 images fan out
across executors with no change.  A dense per-image accumulator (the
reference's approach) would cap image size by executor memory;
the relational form caps nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..registry import query

IMG_N = 6       # last image is noise-only (NO_CIRCLE path)
SIZE = 64
R = 14          # fixed vote radius (ref: radius from px/mm or 0.22*min(H,W))
ACC_THRESH = 12  # ref default acc_thresh (hough_heart_detector.py:317)

# Planted-circle edge maps, runnable verbatim on Spark SQL and DuckDB.
EDGE_POINTS_SQL = f"""
SELECT img AS image_id, y, x FROM (
  SELECT CAST(FLOOR(id / {SIZE * SIZE}) AS BIGINT) AS img,
         CAST(FLOOR(id / {SIZE}) AS BIGINT) % {SIZE} AS y,
         id % {SIZE} AS x
  FROM range({IMG_N * SIZE * SIZE}) AS r(id)
)
WHERE (img < {IMG_N - 1}
       AND ABS((y - (20 + img * 2)) * (y - (20 + img * 2))
             + (x - (24 + img * 3)) * (x - (24 + img * 3)) - {R * R}) <= {R})
   OR ((y * 31 + x * 17 + img * 7) % 211 = 0)
"""

# Fixed-radius voting (hough_heart_detector.py:116-140): each edge point
# votes for the two centers at vertical offset ±round(sqrt(r^2-dx^2))
# for every horizontal offset dx in [-r, r] — the reference's
# vectorized inner loop, re-expressed as explode + groupBy-count.
_VOTES_SQL = f"""
, dxs AS (
  SELECT id - {R} AS dx FROM range({2 * R + 1}) AS r(id)
),
votes_raw AS (
  SELECT e.image_id,
         e.y - CAST(ROUND(SQRT({R * R} - d.dx * d.dx)) AS BIGINT) AS y0,
         e.x - d.dx AS x0
  FROM edge e CROSS JOIN dxs d
  UNION ALL
  SELECT e.image_id,
         e.y + CAST(ROUND(SQRT({R * R} - d.dx * d.dx)) AS BIGINT) AS y0,
         e.x - d.dx AS x0
  FROM edge e CROSS JOIN dxs d
),
votes AS (
  SELECT image_id, y0, x0, COUNT(*) AS votes
  FROM votes_raw
  WHERE y0 BETWEEN 0 AND {SIZE - 1} AND x0 BETWEEN 0 AND {SIZE - 1}
  GROUP BY 1, 2, 3
)
"""

# 3x3 NMS + per-image peak (hough_heart_detector.py:143-157): a cell
# survives iff it equals the max over its 8-neighborhood; the winner is
# the highest survivor (scan-order tie-break), or NO_CIRCLE if below
# the accumulator threshold.
_NMS_PEAK_SQL = f"""
, offs AS (
  SELECT CAST(FLOOR(id / 3) AS BIGINT) - 1 AS oy, id % 3 - 1 AS ox
  FROM range(9) AS r(id)
),
neigh AS (
  SELECT v.image_id, v.y0, v.x0, v.votes, MAX(n.votes) AS neigh_max
  FROM votes v
  JOIN offs o ON TRUE
  LEFT JOIN votes n ON n.image_id = v.image_id
                   AND n.y0 = v.y0 + o.oy AND n.x0 = v.x0 + o.ox
  GROUP BY 1, 2, 3, 4
),
survivors AS (
  SELECT image_id, y0, x0, votes,
         ROW_NUMBER() OVER (PARTITION BY image_id
                            ORDER BY votes DESC, y0, x0) AS rn
  FROM neigh WHERE votes = neigh_max
),
imgs AS (SELECT DISTINCT image_id FROM edge)
SELECT i.image_id,
       CASE WHEN s.votes >= {ACC_THRESH} THEN 'OK' ELSE 'NO_CIRCLE' END AS status,
       CASE WHEN s.votes >= {ACC_THRESH} THEN s.y0 ELSE NULL END AS cy,
       CASE WHEN s.votes >= {ACC_THRESH} THEN s.x0 ELSE NULL END AS cx,
       s.votes AS peak_votes
FROM imgs i LEFT JOIN survivors s ON s.image_id = i.image_id AND s.rn = 1
"""


def _edge_df(spark: SparkSession) -> DataFrame:
    return spark.sql(EDGE_POINTS_SQL)


@query(
    "hough_votes",
    oracle=f"""
    WITH edge AS ({EDGE_POINTS_SQL}){_VOTES_SQL}
    SELECT image_id, y0, x0, votes FROM votes WHERE votes >= {ACC_THRESH}
    """,
)
def q_hough_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulator cells above threshold (SURVEY A10/P4; ref
    hough_heart_detector.py:116-147).

    The explode is two generator joins against a (2r+1)-row offset
    table (broadcast); the count aggregates immediately so the shuffle
    carries cells, not votes.
    """
    edge = _edge_df(spark).alias("e")
    dxs = spark.sql(f"SELECT id - {R} AS dx FROM range({2 * R + 1}) AS r(id)").alias("d")
    dy = F.round(F.sqrt(F.lit(R * R) - F.col("d.dx") * F.col("d.dx"))).cast("bigint")
    up = edge.crossJoin(F.broadcast(dxs)).select(
        "e.image_id", (F.col("e.y") - dy).alias("y0"), (F.col("e.x") - F.col("d.dx")).alias("x0")
    )
    down = edge.crossJoin(F.broadcast(dxs)).select(
        "e.image_id", (F.col("e.y") + dy).alias("y0"), (F.col("e.x") - F.col("d.dx")).alias("x0")
    )
    return (
        up.unionAll(down)
        .filter(F.col("y0").between(0, SIZE - 1) & F.col("x0").between(0, SIZE - 1))
        .groupBy("image_id", "y0", "x0")
        .agg(F.count(F.lit(1)).alias("votes"))
        .filter(F.col("votes") >= ACC_THRESH)
    )


@query(
    "hough_peak",
    oracle=f"WITH edge AS ({EDGE_POINTS_SQL}){_VOTES_SQL}{_NMS_PEAK_SQL}",
)
def q_hough_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 NMS + argmax peak per image, with the NO_CIRCLE fallback
    (SURVEY W3/A11; ref hough_heart_detector.py:143-157,150-151).

    The dilate-compare NMS becomes a 9-offset neighborhood-max join on
    the *sparse* vote cells (the reference dilates a dense array).
    """
    edge = _edge_df(spark)
    # votes WITHOUT the threshold (NMS must see all cells)
    dxs = spark.sql(f"SELECT id - {R} AS dx FROM range({2 * R + 1}) AS r(id)").alias("d")
    e = edge.alias("e")
    dy = F.round(F.sqrt(F.lit(R * R) - F.col("d.dx") * F.col("d.dx"))).cast("bigint")
    raw = e.crossJoin(F.broadcast(dxs)).select(
        "e.image_id", (F.col("e.y") - dy).alias("y0"), (F.col("e.x") - F.col("d.dx")).alias("x0")
    ).unionAll(
        e.crossJoin(F.broadcast(dxs)).select(
            "e.image_id", (F.col("e.y") + dy).alias("y0"), (F.col("e.x") - F.col("d.dx")).alias("x0")
        )
    )
    votes = (
        raw.filter(F.col("y0").between(0, SIZE - 1) & F.col("x0").between(0, SIZE - 1))
        .groupBy("image_id", "y0", "x0")
        .agg(F.count(F.lit(1)).alias("votes"))
    ).alias("v")
    offs = spark.sql(
        "SELECT CAST(FLOOR(id / 3) AS BIGINT) - 1 AS oy, id % 3 - 1 AS ox FROM range(9) AS r(id)"
    ).alias("o")
    n = votes.select(
        F.col("image_id").alias("n_image_id"),
        F.col("y0").alias("n_y0"),
        F.col("x0").alias("n_x0"),
        F.col("votes").alias("n_votes"),
    ).alias("n")
    neigh = (
        votes.crossJoin(F.broadcast(offs))
        .join(
            n,
            (F.col("n.n_image_id") == F.col("v.image_id"))
            & (F.col("n.n_y0") == F.col("v.y0") + F.col("o.oy"))
            & (F.col("n.n_x0") == F.col("v.x0") + F.col("o.ox")),
            "left",
        )
        .groupBy("v.image_id", "v.y0", "v.x0", "v.votes")
        .agg(F.max("n.n_votes").alias("neigh_max"))
    )
    w = Window.partitionBy("image_id").orderBy(F.desc("votes"), "y0", "x0")
    survivors = (
        neigh.filter(F.col("votes") == F.col("neigh_max"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .alias("s")
    )
    imgs = edge.select("image_id").distinct().alias("i")
    ok = F.col("s.votes") >= ACC_THRESH
    return imgs.join(survivors, F.col("s.image_id") == F.col("i.image_id"), "left").select(
        F.col("i.image_id").alias("image_id"),
        F.when(ok, "OK").otherwise("NO_CIRCLE").alias("status"),
        F.when(ok, F.col("s.y0")).alias("cy"),
        F.when(ok, F.col("s.x0")).alias("cx"),
        F.col("s.votes").alias("peak_votes"),
    )


@query(
    "circle_candidate_score",
    oracle=f"""
    WITH edge AS ({EDGE_POINTS_SQL}),
    imgs AS (SELECT DISTINCT image_id FROM edge),
    cands AS (
      SELECT i.image_id,
             20 + CAST(FLOOR(id / 25) AS BIGINT) * 2 AS cy0,
             24 + CAST(FLOOR(id / 5) AS BIGINT) % 5 * 3 AS cx0,
             12 + id % 5 AS r0
      FROM imgs i CROSS JOIN range(125) AS r(id)
    ),
    scored AS (
      SELECT c.image_id, c.cy0, c.cx0, c.r0,
             COUNT(e.x) AS hits,
             CAST(COUNT(e.x) AS DOUBLE) / c.r0 AS score
      FROM cands c
      LEFT JOIN edge e
        ON e.image_id = c.image_id
       AND ABS((e.y - c.cy0) * (e.y - c.cy0)
             + (e.x - c.cx0) * (e.x - c.cx0) - c.r0 * c.r0) <= c.r0
      GROUP BY 1, 2, 3, 4
    )
    SELECT image_id, cy0, cx0, r0, hits, ROUND(score, 6) AS score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY image_id
                 ORDER BY score DESC, cy0, cx0, r0) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def q_circle_candidate_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-circle support scoring + argmax (SURVEY U3/U4/A12; ref
    hough_heart_detector2.py:137-213,259-271 scores sampled perimeter
    support; here support = edge points in the candidate's annulus,
    normalized by radius, a pure theta-join + argmin).
    """
    edge = _edge_df(spark).alias("e")
    imgs = edge.select("image_id").distinct().alias("i")
    cands = imgs.crossJoin(
        F.broadcast(
            spark.sql(
                """
                SELECT 20 + CAST(FLOOR(id / 25) AS BIGINT) * 2 AS cy0,
                       24 + CAST(FLOOR(id / 5) AS BIGINT) % 5 * 3 AS cx0,
                       12 + id % 5 AS r0
                FROM range(125) AS r(id)
                """
            )
        )
    ).alias("c")
    annulus = (
        F.abs(
            (F.col("e.y") - F.col("c.cy0")) * (F.col("e.y") - F.col("c.cy0"))
            + (F.col("e.x") - F.col("c.cx0")) * (F.col("e.x") - F.col("c.cx0"))
            - F.col("c.r0") * F.col("c.r0")
        )
        <= F.col("c.r0")
    )
    scored = (
        cands.join(edge, (F.col("e.image_id") == F.col("c.image_id")) & annulus, "left")
        .groupBy("c.image_id", "c.cy0", "c.cx0", "c.r0")
        .agg(F.count("e.x").alias("hits"))
        .withColumn("score", F.col("hits").cast("double") / F.col("r0"))
    )
    w = Window.partitionBy("image_id").orderBy(F.desc("score"), "cy0", "cx0", "r0")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("image_id", "cy0", "cx0", "r0", "hits", F.round("score", 6).alias("score"))
    )


@query("hough_peak_udf")  # rows-only: per-image numpy accumulator (U3 vehicle)
def q_hough_peak_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image dense-accumulator Hough via applyInPandas — the
    cost-based ALTERNATIVE to the relational vote pipeline (SURVEY
    §4.2b): for dense edge maps the per-image numpy accumulator wins;
    for sparse maps / gigapixel images the relational form wins.
    Verified equal to `hough_peak` in tests.

    The closure is self-contained (numpy only) — workers lack this
    repo on sys.path.
    """
    edge = _edge_df(spark)
    size, r, acc_thresh = SIZE, R, ACC_THRESH

    def detect(pdf):
        import numpy as np
        import pandas as pd

        img = int(pdf["image_id"].iloc[0])
        acc = np.zeros((size, size), dtype=np.int32)
        ys = pdf["y"].to_numpy()
        xs = pdf["x"].to_numpy()
        dxs = np.arange(-r, r + 1)
        dy = np.round(np.sqrt(float(r * r) - dxs.astype(float) ** 2)).astype(int)
        for y, x in zip(ys, xs):
            x0 = x - dxs
            for yy in (y - dy, y + dy):
                ok = (yy >= 0) & (yy < size) & (x0 >= 0) & (x0 < size)
                np.add.at(acc, (yy[ok], x0[ok]), 1)
        # Global argmax: the global max cell is always a 3x3-NMS survivor,
        # and np.argmax's row-major scan equals the relational
        # (votes DESC, y0, x0) tie-break — so no explicit NMS pass needed.
        peak_v = int(acc.max())
        if peak_v < acc_thresh:
            return pd.DataFrame(
                {"image_id": [img], "status": ["NO_CIRCLE"],
                 "cy": [None], "cx": [None], "peak_votes": [peak_v]}
            )
        cy, cx = np.unravel_index(int(np.argmax(acc)), acc.shape)
        return pd.DataFrame(
            {"image_id": [img], "status": ["OK"],
             "cy": [int(cy)], "cx": [int(cx)], "peak_votes": [peak_v]}
        )

    return edge.groupBy("image_id").applyInPandas(
        detect,
        "image_id BIGINT, status STRING, cy BIGINT, cx BIGINT, peak_votes BIGINT",
    )
