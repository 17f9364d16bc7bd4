"""JDBC publish integration smoke (SURVEY 2.1 S8/S9).

The image has no database server, so this round-trip is gated behind
``DATABASE_URL`` (a JDBC URL, e.g. ``jdbc:postgresql://host/db?user=u&
password=p``). Where a database is available it verifies the reference's
full-refresh publish semantics (reference DAG1:216-290): DDL from
``createTableColumnTypes``, ``overwrite`` + ``truncate`` replace, and a
read-back equality check. Everywhere else the same writer surface is
covered at unit level in test_etl_pipeline.py.

Run it locally with e.g.::

    docker run -d -p 5432:5432 -e POSTGRES_PASSWORD=pw postgres:16
    DATABASE_URL='jdbc:postgresql://localhost:5432/postgres?user=postgres&password=pw' \
        python -m pytest tests/test_jdbc_smoke.py -q

(The postgres JDBC driver jar must be on the Spark driver classpath:
``spark.jars.packages=org.postgresql:postgresql:42.7.3``.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DATABASE_URL = os.environ.get("DATABASE_URL")

pytestmark = pytest.mark.skipif(
    not DATABASE_URL,
    reason="JDBC smoke needs DATABASE_URL (no database server in this image)",
)


def test_jdbc_full_refresh_round_trip(spark, sf_dir):
    from state_economics_end_to_end_data_pipeline_spark.io.readers import (
        read_parquet_table,
    )
    from state_economics_end_to_end_data_pipeline_spark.io.writers import write_jdbc

    nation = read_parquet_table(spark, sf_dir, "nation")

    # first publish creates the table with explicit DDL types
    write_jdbc(
        nation,
        DATABASE_URL,
        "smoke_nation",
        create_table_column_types=(
            "n_nationkey BIGINT, n_name VARCHAR(64), "
            "n_regionkey BIGINT, n_comment VARCHAR(256)"
        ),
    )
    # second publish must TRUNCATE + reload, not duplicate (S9 semantics)
    write_jdbc(nation, DATABASE_URL, "smoke_nation")

    back = spark.read.jdbc(DATABASE_URL, "smoke_nation")
    assert back.count() == nation.count()
    a = sorted(nation.select("n_nationkey", "n_name").collect())
    b = sorted(back.select("n_nationkey", "n_name").collect())
    assert a == b

    # full-refresh is idempotent on the aggregate level too
    n_regions = back.select(F.countDistinct("n_regionkey")).first()[0]
    assert n_regions == nation.select(F.countDistinct("n_regionkey")).first()[0]
