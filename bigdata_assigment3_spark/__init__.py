"""bigdata_assigment3_spark — a PySpark-native analytics engine.

Re-expresses every analytic computation of the reference
(MGH7777/bigdata-assigment3: event-analytics REST service, Hough circle
detection, block-matching motion estimation, HMRF-EM segmentation) as
idiomatic Spark DataFrame/SQL operators, plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
columns).  See SURVEY.md for the operator inventory this implements.
"""

from .registry import REGISTRY, query_fns, oracle_sqls  # noqa: F401
from .session import get_spark, ensure_session_conf  # noqa: F401

__all__ = ["REGISTRY", "query_fns", "oracle_sqls", "get_spark", "ensure_session_conf"]
