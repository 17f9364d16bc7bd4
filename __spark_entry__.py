"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``state_economics_end_to_end_data_pipeline_spark.plans``
(catalog.py: SURVEY.md section 2 operator inventory; extensions.py: the
LLM-data-pipeline operators). This module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from state_economics_end_to_end_data_pipeline_spark.plans import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape: scan -> filter -> partial+final
    hash aggregate) on /root/testdata/sf0.001."""
    qs = load_all()
    return qs["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2 plus the
    LLM-pipeline extensions. Each callable takes (spark, sf_dir)."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalent for each query (omitted for
    non-SQL-expressible ops -- the driver then records a rows-only check)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
