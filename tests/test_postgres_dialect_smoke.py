"""Executed Postgres smoke for the S8/S9 publish path (r8 verdict ask #5).

The JDBC jar is still absent in this environment (docs/JDBC_SMOKE.md
probes r6-r9), so Spark's ``write_jdbc`` cannot target Postgres -- but
the container ships real Postgres 15 server binaries, and the
reference's ACTUAL upload (DAG1:255-286) is not JDBC either: it is
CREATE-if-absent + DELETE-all + COPY csv via psycopg2.  This test
executes exactly that protocol against a REAL Postgres started in a
temp cluster: engine DataFrame -> write_csv (S7) -> psql DDL from
``postgres_publish_sql`` (the reference's dtype map in the engine's
dialect) -> COPY -> read back counts/checksums through psql -> run the
full refresh AGAIN and prove idempotence (the S9 semantics).

Postgres refuses to run as root, so cluster management shells through
``su nobody``; everything is skipped cleanly where initdb/su are absent.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import pytest

from state_economics_end_to_end_data_pipeline_spark.io.readers import read_parquet_table
from state_economics_end_to_end_data_pipeline_spark.io.writers import (
    postgres_publish_sql,
    write_csv,
)

SF_DIR = "/root/testdata/sf0.001"


def _have_postgres() -> bool:
    if not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql")):
        return False
    try:
        r = subprocess.run(
            ["su", "-s", "/bin/bash", "nobody", "-c", "true"],
            capture_output=True,
            timeout=10,
        )
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


pytestmark = pytest.mark.skipif(
    not _have_postgres(), reason="no runnable postgres server in this environment"
)


def _nobody(cmd: str, **kw) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "-s", "/bin/bash", "nobody", "-c", cmd],
        capture_output=True,
        text=True,
        cwd="/tmp",
        **kw,
    )


@pytest.fixture(scope="module")
def pg_socket():
    # directly under the world-writable /tmp: pytest's tmp_path lives
    # under a 0700 root-owned parent that `nobody` cannot traverse
    import tempfile

    root = Path(tempfile.mkdtemp(prefix="pgsmoke_", dir="/tmp"))
    root.chmod(0o777)
    data, sock = root / "data", root / "sock"
    sock.mkdir()
    subprocess.run(["chown", "-R", "nobody", str(root)], check=True)
    r = _nobody(f"initdb -D {data} -U smoke --auth=trust")
    assert r.returncode == 0, r.stderr
    r = _nobody(
        f"pg_ctl -D {data} -l {root}/log -o '-k {sock} -c listen_addresses=' start"
    )
    assert r.returncode == 0, r.stderr + (root / "log").read_text()
    yield str(sock)
    _nobody(f"pg_ctl -D {data} -m immediate stop")
    shutil.rmtree(root, ignore_errors=True)


def _psql(sock: str, sql: str, stdin_file: str | None = None) -> str:
    cmd = ["psql", "-h", sock, "-U", "smoke", "postgres", "-tA", "-v", "ON_ERROR_STOP=1"]
    if stdin_file:
        r = subprocess.run(
            cmd + ["-c", sql],
            stdin=open(stdin_file),
            capture_output=True,
            text=True,
        )
    else:
        r = subprocess.run(cmd + ["-c", sql], capture_output=True, text=True)
    assert r.returncode == 0, f"{sql}\n{r.stderr}"
    return r.stdout.strip()


def test_full_refresh_publish_roundtrip_on_real_postgres(spark, pg_socket, tmp_path):
    """DDL from the engine's type map executes on Postgres, COPY loads
    the engine's CSV export byte-exactly, and re-running the refresh
    (DELETE + COPY) leaves counts and checksums unchanged -- the
    reference's full-refresh protocol (DAG1:255-286), executed."""
    from pyspark.sql import functions as F

    df = read_parquet_table(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        "n_regionkey",
    )
    expected_rows = df.count()
    expected_keysum = df.groupBy().sum("n_nationkey").first()[0]

    csv_dir = tmp_path / "nation_csv"
    write_csv(df, str(csv_dir), single_file=True)
    csv_file = next(Path(csv_dir).glob("part-*.csv"))
    csv_copy = tmp_path / "nation.csv"
    csv_copy.write_bytes(csv_file.read_bytes())
    csv_copy.chmod(0o644)

    stmts = postgres_publish_sql(df, "table_nation")
    _psql(pg_socket, stmts["create"])

    for _ in range(2):  # S9: full refresh is idempotent
        _psql(pg_socket, stmts["delete"])
        _psql(pg_socket, stmts["copy"], stdin_file=str(csv_copy))
        n = int(_psql(pg_socket, "SELECT COUNT(*) FROM final_project.table_nation"))
        keysum = int(
            _psql(pg_socket, "SELECT SUM(n_nationkey) FROM final_project.table_nation")
        )
        assert n == expected_rows
        assert keysum == expected_keysum

    # the DDL map was applied: bigint stayed BIGINT (the deliberate
    # deviation from the reference's everything-int -> INTEGER), text TEXT
    types = dict(
        line.split("|")
        for line in _psql(
            pg_socket,
            "SELECT column_name, data_type FROM information_schema.columns "
            "WHERE table_schema='final_project' AND table_name='table_nation'",
        ).splitlines()
    )
    assert types["n_nationkey"] == "bigint"
    assert types["n_name"] == "text"


def test_column_normalization_matches_reference(spark):
    """Space and dot normalize to underscore in the DDL exactly like the
    reference (DAG1:246-247), so dotted min-wage column names publish."""
    df = spark.createDataFrame(
        [(1, 2.0)], "`State.Minimum.Wage` long, `CPI Average` double"
    )
    create = postgres_publish_sql(df, "t")["create"]
    assert '"state_minimum_wage" BIGINT' in create
    assert '"cpi_average" DOUBLE PRECISION' in create


def test_identifiers_quoted_for_reserved_words(spark):
    """r9 advice: a normalized column name that is a Postgres reserved
    word (order, user) or starts with a digit must be double-quoted or
    the generated DDL is invalid; mixed case folds to lowercase FIRST so
    unquoted consumers see reference-parity folding."""
    df = spark.createDataFrame([(1, "x", 2.0)], "`order` long, `user` string, `2024 rate` double")
    stmts = postgres_publish_sql(df, "Table-X", schema="Final Project".replace(" ", "_"))
    assert '"order" BIGINT' in stmts["create"]
    assert '"user" TEXT' in stmts["create"]
    assert '"2024_rate" DOUBLE PRECISION' in stmts["create"]
    assert '"final_project"."table-x"' in stmts["delete"]
    assert stmts["copy"].startswith('COPY "final_project"."table-x" FROM STDIN')
