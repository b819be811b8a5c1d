"""DDL for the engine's ClickHouse deployment surface.

The reference embeds its migrations but ships an empty FS
(``migrations/embed.go`` has no ``//go:embed``; SURVEY §0.1), so the
``limits_hashes`` DDL is reconstructed from the insert column list
(``hashes.go:25``), the Go field types (``hashes_test.go:146,211``)
and the predicate columns (``hashes_test.go:192-196``). The ledger
table is the engine's addition: the durable replacement for the
in-memory ``isSent`` flag.
"""

from __future__ import annotations

from clickhouse_batcher_spark.plans.migrations import Migration

# ClickHouse dialect (target of the JDBC sink).
LIMITS_HASHES_DDL = """
CREATE TABLE IF NOT EXISTS limits_hashes (
    user_id   String,
    amount    UInt32,
    msg       Nullable(String),
    sha256sum String
) ENGINE = MergeTree()
ORDER BY (user_id, sha256sum)
"""

BATCH_LEDGER_DDL = """
CREATE TABLE IF NOT EXISTS batch_ledger (
    batch_id     Int64,
    committed_at DateTime DEFAULT now()
) ENGINE = MergeTree()
ORDER BY batch_id
"""

# Spark-SQL dialect (managed/lakehouse deployment of the same schema;
# uint32 'amount' maps to BIGINT with a range check, SURVEY §1.2).
LIMITS_HASHES_SPARK_DDL = """
CREATE TABLE IF NOT EXISTS limits_hashes (
    user_id   STRING NOT NULL,
    amount    BIGINT NOT NULL,
    msg       BINARY,
    sha256sum STRING NOT NULL
) USING parquet
"""


def clickhouse_migrations() -> list[Migration]:
    return [
        Migration(1, "create_limits_hashes", LIMITS_HASHES_DDL),
        Migration(2, "create_batch_ledger", BATCH_LEDGER_DDL),
    ]
