"""Versioned DDL migrations (the reference's goose layer, migrate.go:13-34).

The reference applies embedded ``.sql`` files in version order against
ClickHouse via goose, tolerating "no next version" as success
(``migrate.go:28-29``) and running before any ingest starts
(``hashes_test.go:49-57`` ordering). Engine restatement:

- a migration = (version, name, sql) applied through a pluggable
  executor — ``spark.sql`` for managed/lakehouse DDL, or a JDBC
  statement runner for ClickHouse DDL;
- applied versions are recorded in a durable ledger file (the
  ``goose_db_version`` analogue) so re-runs are no-ops;
- application is strictly ordered and stops at the first failure,
  leaving the ledger at the last *successful* version (resumable).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class Migration:
    version: int
    name: str
    sql: str


class MigrationRunner:
    def __init__(
        self,
        migrations: list[Migration],
        execute: Callable[[str], None],
        state_path: str,
    ) -> None:
        versions = [m.version for m in migrations]
        if len(set(versions)) != len(versions):
            raise ValueError("duplicate migration versions")
        self.migrations = sorted(migrations, key=lambda m: m.version)
        self.execute = execute
        self.state_path = state_path

    # -- ledger ---------------------------------------------------------
    def applied_versions(self) -> list[int]:
        if not os.path.exists(self.state_path):
            return []
        with open(self.state_path) as fh:
            return sorted(json.load(fh)["applied"])

    def _record(self, version: int) -> None:
        applied = set(self.applied_versions())
        applied.add(version)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"applied": sorted(applied)}, fh)
        os.replace(tmp, self.state_path)  # atomic, crash-safe

    # -- up (goose.UpContext analogue) ----------------------------------
    def up(self) -> list[int]:
        """Apply all pending migrations in order; returns versions applied.

        No pending migrations is success, mirroring the reference's
        tolerance of ``ErrNoNextVersion`` (migrate.go:29).
        """
        applied = set(self.applied_versions())
        newly: list[int] = []
        for mig in self.migrations:
            if mig.version in applied:
                continue
            self.execute(mig.sql)
            self._record(mig.version)
            newly.append(mig.version)
        return newly


def spark_sql_executor(spark) -> Callable[[str], None]:
    """Executor applying DDL through spark.sql (managed tables/views)."""

    def _run(sql: str) -> None:
        spark.sql(sql)

    return _run


def jdbc_statement_executor(
    spark,
    url: str,
    properties: dict[str, str] | None = None,
    driver: str | None = None,
) -> Callable[[str], None]:
    """Executor applying DDL through a raw JDBC ``Statement`` on the
    driver JVM — the path the reference's goose layer takes
    (``migrate.go:13-34``: DDL runs verbatim on the server).

    Spark's JDBC *datasource* can only read and write tables, never
    run DDL, so migrations need ``java.sql.DriverManager`` directly.
    One connection per statement: migrations are a handful of
    one-time statements, and a fresh connection per DDL sidesteps
    driver-specific autocommit/DDL-in-txn quirks. Drivers whose jar
    is on the classpath self-register via the JDBC service loader;
    pass ``driver`` to force-load one that does not.

    Executed for real by the live-Derby migration test
    (tests/test_jdbc_live_derby.py) — the same call shape reaches
    ClickHouse when its jar and server exist. Returns the JDBC update
    count (0 for DDL) so DML users — the sink's server-side
    ``DELETE WHERE`` — can report rows affected; migrations ignore it.
    """

    def _run(sql: str) -> int:
        jvm = spark._jvm
        if driver:
            jvm.java.lang.Class.forName(driver)
        props = jvm.java.util.Properties()
        for k, v in (properties or {}).items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, props)
        try:
            st = conn.createStatement()
            try:
                return st.executeUpdate(sql)
            finally:
                st.close()
        finally:
            conn.close()

    return _run
