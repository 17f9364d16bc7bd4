"""Sinks (SURVEY.md section 2.1, S7-S9).

The reference writes 11 CSVs to a shared volume (DAG1:199-209) and
full-refreshes Postgres via DELETE + COPY (DAG1:272-290). Spark-first
equivalents:

- Parquet is the canonical at-rest format (columnar, splittable,
  statistics for pushdown); CSV kept for interchange parity.
- JDBC publish uses ``mode('overwrite')`` + ``truncate`` -- semantically the
  reference's full refresh, but executed by executors in parallel
  partitions instead of a single driver COPY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """S7 -- CSV sink. ``single_file`` coalesces to one part (interchange
    convenience for dim-sized outputs; never for fact tables at scale)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    truncate: bool = True,
    properties: dict[str, str] | None = None,
    create_table_column_types: str | None = None,
) -> None:
    """S8/S9 -- JDBC full-refresh publish. ``createTableColumnTypes``
    mirrors the reference's dtype->SQL DDL map (DAG1:216-226) when exact
    column types matter."""
    writer = df.write.mode(mode).option("truncate", str(truncate).lower())
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.jdbc(url, table)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Newline-delimited JSON sink (interchange with non-columnar
    consumers; schema travels in the data, so prefer parquet at rest)."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink -- columnar alternative to parquet with the same
    partitioning discipline."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles ONCE at write time so every
    later equi-join/aggregation on the bucket key is exchange-free (the
    co-located-join strategy for repeatedly-joined 100 TB facts; both
    sides must share bucket count and key). Requires saveAsTable --
    bucket metadata lives in the catalog, not the files."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files sized
    for scan efficiency (~target_file_bytes each). The file count is
    derived from the actual on-disk bytes, never guessed; optional
    ``sort_within_by`` clusters rows inside each file so min/max row-group
    stats prune better on those columns. Returns the output file count.

    At 100 TB this is the maintenance job that keeps streaming/incremental
    outputs (thousands of tiny files) scannable: listing cost and per-file
    open overhead both collapse."""
    from pathlib import Path

    src_bytes = sum(f.stat().st_size for f in Path(src_path).rglob("*.parquet"))
    n_files = max(1, round(src_bytes / target_file_bytes))
    df = spark.read.parquet(src_path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Incremental publish: overwrite ONLY the partitions present in
    ``df``, leaving all others untouched -- the scale path that replaces
    the reference's full-refresh DELETE+COPY (DAG1:272-290) when a
    monthly run touches one month of a years-deep table. Static overwrite
    (the default) would drop the entire root first; dynamic mode diffs at
    the partition-directory level. The session conf is scoped and
    restored so batch jobs sharing the session keep static semantics."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set(key, prev)


def postgres_publish_sql(
    df: DataFrame, table: str, schema: str = "final_project"
) -> dict[str, str]:
    """S8/S9 in the reference's ACTUAL dialect: the SQL statements of its
    Postgres full refresh (reference DAG1:216-226 dtype->DDL map,
    DAG1:255-286 create-if-absent / DELETE-all / COPY-with-header), built
    from a Spark schema so any engine output can be published to Postgres
    WITHOUT a JDBC driver on the classpath -- pair with a CSV export
    (write_csv) and psql/copy_expert.  Returns {create, delete, copy}.

    Type map (Spark -> Postgres): integral types 32-bit and under ->
    INTEGER like the reference; LongType -> BIGINT, a DELIBERATE
    deviation from DAG1:218 (the reference maps every pandas integer
    dtype to INTEGER, which overflows past 2^31 -- a real hazard at
    engine scale); float/double -> DOUBLE PRECISION; decimal ->
    NUMERIC(p, s) (exact stays exact); boolean -> BOOLEAN; date ->
    DATE; timestamp -> TIMESTAMP; everything else -> TEXT.  Column names normalize space and dot to underscore exactly
    like the reference (DAG1:246-247).
    """
    from pyspark.sql import types as T

    def sql_type(dt: T.DataType) -> str:
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "INTEGER"
        if isinstance(dt, T.LongType):
            return "BIGINT"
        if isinstance(dt, T.DecimalType):
            # exact decimals stay exact: NUMERIC(p,s), not DOUBLE (the
            # same silent-loss hazard class the BIGINT deviation fixes)
            return f"NUMERIC({dt.precision}, {dt.scale})"
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return "DOUBLE PRECISION"
        if isinstance(dt, T.BooleanType):
            return "BOOLEAN"
        if isinstance(dt, T.DateType):
            return "DATE"
        if isinstance(dt, T.TimestampType):
            return "TIMESTAMP"
        return "TEXT"

    def norm(c: str) -> str:
        return c.replace(" ", "_").replace(".", "_")

    def quote(ident: str) -> str:
        # double-quote every identifier (r9 advice): a normalized name
        # that is a Postgres reserved word ("order", "user") or starts
        # with a digit is invalid DDL unquoted, and mixed case silently
        # folds to lowercase. Lowercase first so unquoted readers keep
        # reference-parity folding; embedded quotes are doubled per SQL.
        return '"' + ident.lower().replace('"', '""') + '"'

    cols = ", ".join(
        f"{quote(norm(f.name))} {sql_type(f.dataType)}" for f in df.schema
    )
    qualified = f"{quote(schema)}.{quote(table)}"
    return {
        "create": (
            f"CREATE SCHEMA IF NOT EXISTS {quote(schema)}; "
            f"CREATE TABLE IF NOT EXISTS {qualified} ({cols});"
        ),
        "delete": f"DELETE FROM {qualified};",
        "copy": f"COPY {qualified} FROM STDIN WITH CSV HEADER DELIMITER AS ',';",
    }
