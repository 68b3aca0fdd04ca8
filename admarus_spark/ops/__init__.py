"""Large-scale training-data pipeline operators (beyond the reference's own
operator set): deduplication, similarity search, text analysis, multimodal
plumbing, event windows. Each operator ships a Spark DataFrame implementation
and a DuckDB ANSI-SQL oracle with pinned, engine-portable hashing (md5/sha2 —
available and bit-identical in both engines) so the driver's value-hash
comparison is meaningful.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import dedup, events, multimodal, similarity, textstats

_MODULES = (dedup, similarity, textstats, events, multimodal)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
