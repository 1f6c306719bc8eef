"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``biomedical_ner_spark`` package; this module
is the thin registry wrapper.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biomedical_ner_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md A4): documents -> tokenize -> BIO tag ->
    span merge -> entity counts per friendly type name, at sf0.001."""
    return Q.q_entity_type_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for EVERY registered query — including the Arrow-UDF
    and iterative ones (kg_linked rebuilds the full linking score
    relationally, kg_canonical walks CC with a recursive CTE, lsh_topk
    recomputes the md5-derived hyperplanes, media_features derives the
    synthetic payloads from range(96)).  Zero rows-only entries."""
    return Q.oracle_sql()
