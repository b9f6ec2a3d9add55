"""SQL dialect rendering for the JDBC sink surface.

The reference's production database is MySQL (reference Pipfile:6-11 pins
mysql+pymysql; db_model.py:65-67 builds the URL), but this sandbox has no
MySQL server — the live JDBC path is exercised against embedded Derby
(tests/test_sink_services.py).  What CAN be verified without a server is
the exact SQL this engine would send: every statement the sink executes is
rendered HERE, per dialect, as a pure string function — the live Derby path
runs the ``ansi`` renderings, and the ``mysql`` renderings are golden-pinned
in tests/test_sink_services.py so the environment-bound gap shrinks to
"does MySQL accept what we'd send" (DIVERGENCES.md records that residue).

Dialect differences covered:

* identifier quoting — ANSI double quotes vs MySQL backticks (MySQL accepts
  double quotes only under the non-default ANSI_QUOTES sql_mode, so the
  mysql renderings never rely on it);
* types — ANSI/Derby ``TIMESTAMP`` vs MySQL ``DATETIME(6)`` (MySQL's
  TIMESTAMP is range-limited to 1970-2038 and tz-shifts on write;
  DATETIME(6) matches the reference's SQLAlchemy ``DateTime`` mapping and
  keeps microseconds), and ``DECIMAL(25,6)`` for channel values in both
  (reference db_model.py:54);
* upsert — the portable two-batch shape (UPDATE all known keys, INSERT the
  misses — what upsert_status_jdbc executes on every dialect) plus MySQL's
  native single-round-trip ``INSERT ... ON DUPLICATE KEY UPDATE`` variant,
  rendered for deployments that prefer one executeBatch over two.

Schema note: the status table is keyed directly on ``parameter`` (the
reference keeps a surrogate ``id`` plus a UNIQUE constraint,
db_model.py:57-62 — same upsert semantics, one fewer index; recorded in
DIVERGENCES.md), and channel_data keeps the reference's surrogate id as an
auto-increment primary key with a (channel_id, ts) secondary index for the
per-channel time-range scans the reference issues (daq-3i.py's retention
delete and the UI's history reads).
"""

from __future__ import annotations

ANSI = "ansi"
MYSQL = "mysql"
_DIALECTS = (ANSI, MYSQL)


def dialect_of_url(url: str) -> str:
    """Infer the rendering dialect from a JDBC URL (``jdbc:mysql:`` ->
    mysql, everything else -> the ANSI renderings Derby/Postgres take)."""
    return MYSQL if url.startswith("jdbc:mysql:") else ANSI


def quote_ident(name: str, dialect: str) -> str:
    if dialect == MYSQL:
        return f"`{name}`"
    return f'"{name}"'


def _check(dialect: str) -> None:
    if dialect not in _DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r} (use one of {_DIALECTS})")


def status_create_table_sql(dialect: str, table: str = "daq_status") -> str:
    """DDL for the status table.  Parameter-keyed (see module docstring);
    MySQL gets DATETIME(6) + explicit InnoDB (upsert needs a transactional
    engine), ANSI/Derby the plain TIMESTAMP form the live test path runs."""
    _check(dialect)
    q = lambda n: quote_ident(n, dialect)  # noqa: E731
    if dialect == MYSQL:
        return (
            f"CREATE TABLE {q(table)} ("
            f"{q('parameter')} VARCHAR(128) NOT NULL, "
            f"{q('status')} INT, "
            f"{q('ts')} DATETIME(6), "
            f"PRIMARY KEY ({q('parameter')})"
            f") ENGINE=InnoDB"
        )
    return (
        f"CREATE TABLE {table} ({q('parameter')} VARCHAR(128) PRIMARY KEY, "
        f"{q('status')} INTEGER, {q('ts')} TIMESTAMP)"
    )


def channel_data_create_table_sql(
    dialect: str, table: str = "channel_data"
) -> str:
    """DDL for the measurement table — the reference's column SET
    (db_model.py:49-54: surrogate id, channel_id FK, ts, DECIMAL(25,6)
    value) plus the (channel_id, ts) index its access patterns need.
    Two DELIBERATE widenings vs the reference (recorded in DIVERGENCES.md):
    the surrogate id is BIGINT, not the reference's Integer — at this
    engine's ingest rates a 2^31 key space overflows in days — and
    identifier columns are VARCHAR(128), not String(25), to fit the longer
    parameter names the extension ops emit.  DECIMAL(25,6) for ``value``
    is kept exact."""
    _check(dialect)
    q = lambda n: quote_ident(n, dialect)  # noqa: E731
    if dialect == MYSQL:
        return (
            f"CREATE TABLE {q(table)} ("
            f"{q('id')} BIGINT NOT NULL AUTO_INCREMENT, "
            f"{q('channel_id')} INT NOT NULL, "
            f"{q('ts')} DATETIME(6) NOT NULL, "
            f"{q('value')} DECIMAL(25,6), "
            f"PRIMARY KEY ({q('id')}), "
            f"KEY {q('ix_channel_ts')} ({q('channel_id')}, {q('ts')})"
            f") ENGINE=InnoDB"
        )
    return (
        f"CREATE TABLE {table} ("
        f"{q('id')} BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, "
        f"{q('channel_id')} INTEGER NOT NULL, "
        f"{q('ts')} TIMESTAMP NOT NULL, "
        f"{q('value')} DECIMAL(25,6))"
    )


def status_select_keys_sql(dialect: str, table: str = "daq_status") -> str:
    _check(dialect)
    return f"SELECT {quote_ident('parameter', dialect)} FROM {table}"


def status_update_sql(dialect: str, table: str = "daq_status") -> str:
    """Bind order (status, ts, parameter) — upsert_status_jdbc's UPDATE
    batch."""
    _check(dialect)
    q = lambda n: quote_ident(n, dialect)  # noqa: E731
    return (
        f"UPDATE {table} SET {q('status')} = ?, {q('ts')} = ? "
        f"WHERE {q('parameter')} = ?"
    )


def status_insert_sql(dialect: str, table: str = "daq_status") -> str:
    """Bind order (parameter, status, ts) — upsert_status_jdbc's INSERT
    batch."""
    _check(dialect)
    q = lambda n: quote_ident(n, dialect)  # noqa: E731
    return (
        f"INSERT INTO {table} ({q('parameter')}, {q('status')}, {q('ts')}) "
        f"VALUES (?, ?, ?)"
    )


def mysql_supports_insert_alias(server_version: str | None) -> bool:
    """True iff the server takes the 8.0.19+ ``INSERT ... AS new`` row-alias
    form: a genuine MySQL >= 8.0.19.  MariaDB never does (any version —
    including the ``5.5.5-10.x-MariaDB`` replication-prefixed strings its
    servers report), and an UNKNOWN version (None, unparsable) must get the
    legacy form, which every MySQL 8.x and MariaDB still execute."""
    if not server_version or "mariadb" in server_version.lower():
        return False
    import re

    m = re.match(r"(\d+)\.(\d+)\.(\d+)", server_version)
    if not m:
        return False
    return tuple(int(g) for g in m.groups()) >= (8, 0, 19)


def status_upsert_on_duplicate_sql(
    table: str = "daq_status", server_version: str | None = None
) -> str:
    """MySQL's native single-statement upsert — ONE executeBatch instead of
    the portable UPDATE+INSERT pair, for deployments on the reference's
    production dialect.  Bind order (parameter, status, ts), matching
    status_insert_sql so the same _bind routine drives either shape.
    MySQL-only (Derby has no ON DUPLICATE KEY; the ANSI path keeps the
    two-batch shape the Derby round-trip test pins).

    Form selection is gated on the DETECTED server version (pass the string
    JDBC's ``DatabaseMetaData.getDatabaseProductVersion()`` / pymysql's
    ``server_version`` reports): the 8.0.19+ row-alias form (``VALUES (...)
    AS new ... = new.col``) only where supported — it is a hard syntax
    error on MySQL < 8.0.19 and on every MariaDB — and the legacy
    ``VALUES(col)`` function form by DEFAULT, which executes on all of
    them (deprecated since 8.0.20, but a warning beats a failure on
    compatible servers; ADVICE r13)."""
    q = lambda n: quote_ident(n, MYSQL)  # noqa: E731
    head = (
        f"INSERT INTO {table} ({q('parameter')}, {q('status')}, {q('ts')}) "
        f"VALUES (?, ?, ?)"
    )
    if mysql_supports_insert_alias(server_version):
        return (
            f"{head} AS new "
            f"ON DUPLICATE KEY UPDATE {q('status')} = new.{q('status')}, "
            f"{q('ts')} = new.{q('ts')}"
        )
    return (
        f"{head} "
        f"ON DUPLICATE KEY UPDATE {q('status')} = VALUES({q('status')}), "
        f"{q('ts')} = VALUES({q('ts')})"
    )
