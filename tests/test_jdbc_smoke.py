"""JDBC publish integration smoke (SURVEY 2.1 S8/S9).

Verifies the reference's full-refresh publish semantics (reference
DAG1:216-290): DDL from ``createTableColumnTypes`` (the dtype->SQL map,
DAG1:216-226), ``overwrite`` + ``truncate`` replace (DELETE+COPY,
DAG1:272-290), and a read-back equality check.

Two execution modes:

- **Embedded Derby (default, runs everywhere).** Spark bundles Derby for
  the Hive metastore, so ``jdbc:derby:memory:...`` is a real JDBC
  database on the classpath with no server and no new dependency. Spark
  ships a ``DerbyDialect``, and Derby >= 10.7 supports ``TRUNCATE
  TABLE``, so the exact production writer path (``write_jdbc``) executes
  unmodified. In-memory Derby lives in the driver JVM -- fine under
  local[*] where executors share it; a real cluster would target a
  networked database as below.
- **External database** when ``DATABASE_URL`` is set (a JDBC URL, e.g.
  ``jdbc:postgresql://host/db?user=u&password=p``)::

      docker run -d -p 5432:5432 -e POSTGRES_PASSWORD=pw postgres:16
      DATABASE_URL='jdbc:postgresql://localhost:5432/postgres?user=postgres&password=pw' \
          python -m pytest tests/test_jdbc_smoke.py -q

  (driver jar via ``spark.jars.packages=org.postgresql:postgresql:42.7.3``;
  full recipe in docs/JDBC_SMOKE.md).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

DATABASE_URL = os.environ.get("DATABASE_URL")
DERBY_URL = "jdbc:derby:memory:econ_smoke;create=true"


@pytest.fixture(scope="module")
def jdbc_url(spark) -> str:
    """External DATABASE_URL if provided, else embedded in-memory Derby."""
    return DATABASE_URL or DERBY_URL


def test_jdbc_full_refresh_round_trip(spark, sf_dir, jdbc_url):
    from state_economics_end_to_end_data_pipeline_spark.io.readers import (
        read_parquet_table,
    )
    from state_economics_end_to_end_data_pipeline_spark.io.writers import write_jdbc

    nation = read_parquet_table(spark, sf_dir, "nation")

    # first publish creates the table with explicit DDL types (S8):
    # n_nationkey/n_regionkey are int32 in parquet, widened to BIGINT by
    # the createTableColumnTypes map -- the read-back dtype proves the DDL
    # was applied rather than Spark's default INTEGER mapping.
    write_jdbc(
        nation,
        jdbc_url,
        "smoke_nation",
        create_table_column_types=(
            "n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT"
        ),
    )
    # second publish must TRUNCATE + reload, not duplicate (S9 semantics)
    write_jdbc(nation, jdbc_url, "smoke_nation")

    back = spark.read.jdbc(jdbc_url, "smoke_nation")
    assert back.count() == nation.count()  # truncated, not appended

    # the second write passed no DDL: if overwrite had dropped and
    # recreated the table, the key columns would read back with the
    # database's default int mapping -- BIGINT proves truncate-in-place.
    dtypes = dict(back.dtypes)
    assert isinstance(back.schema["n_nationkey"].dataType, LongType), dtypes

    a = sorted(nation.select("n_nationkey", "n_name").collect())
    b = sorted(back.select("n_nationkey", "n_name").collect())
    assert a == b

    # full-refresh is idempotent on the aggregate level too
    n_regions = back.select(F.countDistinct("n_regionkey")).first()[0]
    assert n_regions == nation.select(F.countDistinct("n_regionkey")).first()[0]


def test_jdbc_predicate_pushdown_read(spark, sf_dir, jdbc_url):
    """The JDBC read path pushes filters to the database: a keyed read
    returns only matching rows (and the pushed filter appears in the
    physical plan), so a 100 TB-side Spark job probing a published dim
    does not drag the whole table across the wire."""
    from state_economics_end_to_end_data_pipeline_spark.io.readers import (
        read_parquet_table,
    )
    from state_economics_end_to_end_data_pipeline_spark.io.writers import write_jdbc

    customer = read_parquet_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    write_jdbc(customer, jdbc_url, "smoke_customer")

    back = spark.read.jdbc(jdbc_url, "smoke_customer").filter(F.col("c_custkey") <= 10)
    assert back.count() == customer.filter(F.col("c_custkey") <= 10).count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_custkey" in plan


def test_jdbc_partitioned_parallel_read(spark, sf_dir, jdbc_url):
    """S10-adjacent: partitioned JDBC read (column/bounds/numPartitions)
    splits the table into range predicates executed by parallel tasks --
    the ingest shape for pulling a large published table back into Spark."""
    from state_economics_end_to_end_data_pipeline_spark.io.readers import (
        read_parquet_table,
    )
    from state_economics_end_to_end_data_pipeline_spark.io.writers import write_jdbc

    orders = read_parquet_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_jdbc(orders, jdbc_url, "smoke_orders")

    lo, hi = orders.select(F.min("o_orderkey"), F.max("o_orderkey")).first()
    back = spark.read.jdbc(
        jdbc_url,
        "smoke_orders",
        column="o_orderkey",
        lowerBound=int(lo),
        upperBound=int(hi) + 1,
        numPartitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()
    assert back.select(F.sum("o_orderkey")).first()[0] == (
        orders.select(F.sum("o_orderkey")).first()[0]
    )
