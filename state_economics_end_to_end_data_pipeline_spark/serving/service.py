"""Serving surface (SURVEY.md section 2.8, V1-V3).

The reference serves its 11 tables through a Flask endpoint that builds
``"SELECT * FROM final_project." + table + " LIMIT " + limit`` by string
concatenation (finalprojectapi.py:17-37 -- SQL injection). This module
keeps the same capability surface -- table catalog, column introspection,
limit query -- with identifiers validated against the catalog and the
limit bound-checked, never interpolated. No HTTP framework: any server
can wrap ``DataService`` (the reference's Flask layer is 20 lines of
transport, not data semantics).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

MAX_LIMIT = 10_000


class DataService:
    """Catalog of served tables + validated limit queries."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    def register(self, name: str, df: DataFrame) -> None:
        if not name.isidentifier():
            raise ValueError(f"invalid table name: {name!r}")
        self._tables[name] = df

    def register_parquet(self, name: str, path: str) -> None:
        self.register(name, self.spark.read.parquet(path))

    def list_tables(self) -> list[str]:
        """V1 -- table catalog."""
        return sorted(self._tables)

    def columns(self, table: str) -> list[str]:
        """V3 -- column-name introspection."""
        return list(self._resolve(table).columns)

    def get_data(self, table: str, limit: int = 10) -> dict[str, Any]:
        """V2 -- ``SELECT * FROM t LIMIT n`` with the identifier resolved
        against the catalog and the limit validated (the reference's
        injection path, made safe)."""
        if not isinstance(limit, int) or not (1 <= limit <= MAX_LIMIT):
            raise ValueError(f"limit must be an int in [1, {MAX_LIMIT}]: {limit!r}")
        df = self._resolve(table).limit(limit)
        return {
            "table": table,
            "columns": df.columns,
            "rows": [row.asDict() for row in df.collect()],
        }

    def _resolve(self, table: str) -> DataFrame:
        if table not in self._tables:
            raise KeyError(
                f"unknown table {table!r}; available: {self.list_tables()}"
            )
        return self._tables[table]
