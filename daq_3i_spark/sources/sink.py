"""Partitioned sink layout — how channel_data is laid out at 100 TB.

The reference appends every sample to one unpartitioned MySQL table
(/root/reference/db_model.py:49-54).  At 100 TB the sink must be a
date-partitioned parquet table so that

* time-range scans prune partitions at file-listing time (no data touched
  outside the range),
* retention (drop old days) is a metadata operation, never a table scan,
* the per-channel access path stays narrow via row-group sorting on
  channel_id within each date partition (min/max stats prune row groups).

``p_date`` is a derived partition column; the natural key columns stay in the
data so readers are unaffected.  Writing sorted-within-partitions puts each
channel's rows in contiguous row groups.

Table services (time retention, small-file compaction) follow a
**versioned-manifest commit protocol** (the Delta/Iceberg snapshot idea,
reduced to its core):

* ``<root>/_manifests/vNNNNN.json`` lists the relative data-file paths that
  constitute that version of the table.  The leading underscore hides the
  directory from Spark's file index, so plain ``spark.read.parquet(root)``
  still works between service passes.
* A service pass never deletes a referenced file before the next manifest is
  committed: replacement files are staged OUTSIDE the table root, renamed
  into the live partition directories under their unique names, and only
  then does one atomic manifest rename publish the new version.  Old files
  are garbage-collected AFTER the commit.
* A crash at ANY point leaves the previous manifest's files intact —
  :func:`read_channel_data_versioned` (the manifest-pinned reader) sees
  either the old layout or the new one, never a mix, and never loses rows.
  Orphan files from a crashed pass are swept by the next pass's recovery
  step (:func:`gc_unreferenced`), which makes every service idempotent.

All file-system access goes through the Hadoop FileSystem API (py4j), not
``os``: the same code paths work against ``file://``, HDFS, and S3A.  On
HDFS the two renames (file publish, manifest commit) are atomic; on S3A the
manifest rename is the only non-atomic step and would swap for a
conditional PUT in production.

Concurrency: manifests serialize writers OPTIMISTICALLY — every pass reads
version N and commits N+1; the commit is a compare-and-swap (no-overwrite
rename on HDFS, rename + writer-token read-back on local fs, conditional
PUT on S3A) and the loser of a race raises :class:`ManifestConflictError`
instead of silently dropping the winner's version.  The loser's published
files are unreferenced orphans the next pass's recovery GC sweeps, so the
losing service is safely re-runnable on top of the winner's version.
"""

from __future__ import annotations

import json
import posixpath
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: compaction rewrite target: partitions are rewritten into
#: ceil(partition_bytes / TARGET_FILE_BYTES) range-sorted files, so a hot
#: multi-TB day becomes many parallel-scannable files instead of the single
#: giant file a coalesce(1) would produce.
TARGET_FILE_BYTES = 128 * 1024 * 1024

_MANIFEST_DIR = "_manifests"

#: test-only failpoint hook: called with a stage name between protocol
#: stages ("recovered", "staged", "published", "committed") so crash-safety
#: tests can kill a service pass at an exact point.  Production callers
#: leave it as the no-op default.
Failpoint = Callable[[str], None]
_NOOP: Failpoint = lambda stage: None  # noqa: E731


def write_channel_data_partitioned(df: DataFrame, path: str) -> None:
    """(id, channel_id, ts, value) -> parquet partitioned by p_date, sorted by
    channel_id within each partition."""
    (
        df.withColumn("p_date", F.to_date("ts"))
        .repartition(F.col("p_date"))
        .sortWithinPartitions("channel_id", "id")
        .write.mode("overwrite")
        .partitionBy("p_date")
        .parquet(path)
    )


def read_channel_data_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# --- Hadoop FileSystem plumbing (works on file://, HDFS, S3A) ---------------


def _fs(spark: SparkSession, path: str):
    """(FileSystem, jvm) for ``path`` — the scheme's filesystem, from the
    session's Hadoop configuration (credentials, endpoints) rather than the
    local OS, so listings and renames behave on object stores too."""
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    return jp.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _jpath(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path(posixpath.join(*parts))


def _ls(fs, jvm, *parts: str) -> list:
    jp = _jpath(jvm, *parts)
    if not fs.exists(jp):
        return []
    return list(fs.listStatus(jp))


def list_partitions(spark: SparkSession, path: str) -> dict[str, dict[str, int]]:
    """{partition value -> {parquet file name -> bytes}} for a
    ``p_date``-partitioned table root, via the Hadoop FS API."""
    fs, jvm = _fs(spark, path)
    out: dict[str, dict[str, int]] = {}
    for st in _ls(fs, jvm, path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("p_date="):
            out[name.split("=", 1)[1]] = {
                f.getPath().getName(): f.getLen()
                for f in fs.listStatus(st.getPath())
                if f.getPath().getName().endswith(".parquet")
            }
    return out


# --- versioned manifests -----------------------------------------------------


def latest_manifest(
    spark: SparkSession, path: str, version: int | None = None
) -> tuple[int, list[str]] | None:
    """(version, sorted relative data-file paths) of the newest committed
    manifest — or of exactly ``version`` when given (time travel; raises if
    that version was never committed).  None for a table no service has
    touched yet."""
    fs, jvm = _fs(spark, path)
    best = None
    for st in _ls(fs, jvm, path, _MANIFEST_DIR):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            v = int(name[1:-5])
            if version is not None:
                if v == version:
                    best = (v, st.getPath())
            elif best is None or v > best[0]:
                best = (v, st.getPath())
    if best is None:
        if version is not None:
            raise ValueError(f"no committed manifest v{version} under {path}")
        return None
    stream = fs.open(best[1])
    try:
        doc = json.loads(jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8"))
    finally:
        stream.close()
    return best[0], doc["files"]


class ManifestConflictError(RuntimeError):
    """Another writer committed this manifest version first.

    The optimistic-concurrency contract (one table, many uncoordinated
    service jobs): every pass reads version N, stages its rewrite, and
    tries to commit N+1.  The LOSER of a race must fail LOUDLY — its
    survivors list is derived from N and would resurrect files the winner
    dropped — and its published-but-uncommitted files become orphans the
    next pass's recovery GC sweeps (services stay idempotent; re-run the
    losing service to apply it on top of the winner's version).
    """


def commit_manifest(spark: SparkSession, path: str, version: int, files: list[str]) -> None:
    """Atomically publish manifest ``version``: write the JSON to a hidden
    unique temp name, then one rename — readers either see the complete new
    manifest or keep resolving the previous one.

    The rename doubles as the compare-and-swap against concurrent writers:
    on HDFS a rename onto an existing file is an atomic no-op returning
    false (the loser raises :class:`ManifestConflictError`); local
    ``file://`` rename(2) silently OVERWRITES, so after the rename the
    manifest is read back and a per-commit writer token verified — a loser
    whose content was replaced (or who replaced the winner's) detects it
    and raises instead of silently losing a version.  On S3A the rename
    would swap for a conditional PUT (If-None-Match), which subsumes both.
    """
    import uuid

    fs, jvm = _fs(spark, path)
    fs.mkdirs(_jpath(jvm, path, _MANIFEST_DIR))
    fname = f"v{version:05d}.json"
    token = uuid.uuid4().hex
    tmp = _jpath(jvm, path, _MANIFEST_DIR, f".tmp-{token}-{fname}")
    out = fs.create(tmp, True)
    try:
        out.write(
            bytearray(
                json.dumps(
                    {"version": version, "files": sorted(files), "writer": token}
                ).encode()
            )
        )
    finally:
        out.close()
    final = _jpath(jvm, path, _MANIFEST_DIR, fname)
    if fs.exists(final) or not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise ManifestConflictError(
            f"manifest {fname} already committed under {path} by a concurrent "
            "writer — this pass read a stale base version; re-run it"
        )
    stream = fs.open(final)
    try:
        doc = json.loads(jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8"))
    finally:
        stream.close()
    if doc.get("writer") != token:
        raise ManifestConflictError(
            f"manifest {fname} under {path} was replaced by a concurrent "
            "writer during commit — this pass lost the race; re-run it"
        )


def snapshot_manifest(spark: SparkSession, path: str) -> tuple[int, list[str]]:
    """Latest manifest, bootstrapping v1 from the current directory layout
    for tables written before any service pass (write_channel_data_partitioned
    leaves a clean overwrite, so the snapshot is authoritative)."""
    m = latest_manifest(spark, path)
    if m is not None:
        return m
    files = sorted(
        f"p_date={p}/{f}"
        for p, fl in list_partitions(spark, path).items()
        for f in fl
    )
    commit_manifest(spark, path, 1, files)
    return 1, files


def read_channel_data_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Manifest-pinned read: loads EXACTLY the requested committed version's
    files — latest by default, any still-retained older version for time
    travel (service passes only GC files the NEWEST manifest dropped, so
    the previous version stays readable until the next pass).  basePath
    keeps the p_date partition column.  This is the reader that never
    observes a half-applied service pass."""
    m = latest_manifest(spark, path, version)
    if m is None:
        return read_channel_data_partitioned(spark, path)
    _, files = m
    if not files:
        raise ValueError(f"manifest for {path} references no files")
    return (
        spark.read.option("basePath", path)
        .parquet(*[posixpath.join(path, f) for f in files])
    )


def gc_unreferenced(
    spark: SparkSession,
    path: str,
    keep_versions: int = 1,
    min_age_sec: float = 0.0,
) -> list[str]:
    """Delete data files not referenced by any of the newest
    ``keep_versions`` manifests (plus any partition directory left with no
    data files).  Run at the START of a service pass (recovering a crashed
    predecessor's orphans) and at the END (dropping the files the new
    version replaced).  With keep_versions > 1 the previous versions stay
    fully readable through read_channel_data_versioned(version=...) — time
    travel at the cost of retained storage; note plain directory reads
    then see multiple versions' files and must go through the manifest
    reader.  No manifest -> no-op.  Returns removed paths.

    ``min_age_sec`` is the concurrent-writer guard (Delta's VACUUM
    retention idea): an unreferenced file younger than it is SKIPPED,
    because "orphan" is indistinguishable from "published by a concurrent
    pass that has not committed yet" — recovery GC with age 0 could delete
    a racing writer's fresh files in the window between its publish and
    its manifest commit.  Single-writer recovery (the crash tests, the
    post-commit drop of replaced files) keeps the immediate default;
    uncoordinated concurrent services must pass an age exceeding their
    longest pass duration (see the service entry points' orphan_age_sec)."""
    import time
    fs0, jvm0 = _fs(spark, path)
    versions = sorted(
        (
            int(st.getPath().getName()[1:-5])
            for st in _ls(fs0, jvm0, path, _MANIFEST_DIR)
            if st.getPath().getName().startswith("v")
            and st.getPath().getName().endswith(".json")
        ),
        reverse=True,
    )
    if not versions:
        return []
    keep: set[str] = set()
    for v in versions[: max(1, keep_versions)]:
        keep.update(latest_manifest(spark, path, v)[1])
    fs, jvm = _fs(spark, path)
    now_ms = time.time() * 1000.0
    removed: list[str] = []
    for p, fl in list_partitions(spark, path).items():
        pdir = f"p_date={p}"
        touched = False
        for fname in fl:
            rel = f"{pdir}/{fname}"
            if rel not in keep:
                jp = _jpath(jvm, path, rel)
                if min_age_sec > 0:
                    try:
                        mtime = fs.getFileStatus(jp).getModificationTime()
                    except Exception:
                        continue  # already gone — a racing GC swept it
                    if now_ms - mtime < min_age_sec * 1000.0:
                        continue  # possibly a concurrent writer's fresh publish
                fs.delete(jp, False)
                removed.append(rel)
                touched = True
        if not touched:
            continue
        # drop the directory once no visible data files remain (checksum
        # droppings and other hidden files don't keep a partition alive)
        left = [
            s.getPath().getName()
            for s in _ls(fs, jvm, path, pdir)
            if not s.getPath().getName().startswith((".", "_"))
        ]
        if not left:
            fs.delete(_jpath(jvm, path, pdir), True)
    # stale manifest temps: a crash between commit_manifest's create and
    # rename strands `.tmp-<token>-vNNNNN.json` in _manifests forever (the
    # rename is the only consumer).  Age-gated like data files — a YOUNG
    # temp may be a concurrent writer mid-commit; a dead predecessor's is
    # garbage (its content is re-derived by the re-run pass).
    for st in _ls(fs, jvm, path, _MANIFEST_DIR):
        name = st.getPath().getName()
        if not name.startswith(".tmp-"):
            continue
        if min_age_sec > 0 and now_ms - st.getModificationTime() < min_age_sec * 1000.0:
            continue
        fs.delete(st.getPath(), False)
        removed.append(f"{_MANIFEST_DIR}/{name}")
    return removed


# --- the shared service commit protocol --------------------------------------


def _open_service(
    spark: SparkSession, path: str, keep_versions: int, orphan_age_sec: float = 0.0
) -> tuple[int, list[str], bool]:
    """Service-pass preamble: latest manifest (bootstrapping v1 for a table
    no service has touched) plus the orphan-recovery GC.  A just-bootstrapped
    manifest IS the directory layout, so the recovery listing is skipped —
    one less metadata pass on the common fresh-table path."""
    m = latest_manifest(spark, path)
    if m is None:
        version, files = snapshot_manifest(spark, path)
        return version, files, True
    gc_unreferenced(spark, path, keep_versions, min_age_sec=orphan_age_sec)
    return m[0], m[1], False


def _staging_dir(spark: SparkSession, path: str, min_age_sec: float = 0.0) -> str:
    """Per-PASS staging area for partition rewrites, OUTSIDE the table root:
    a crash mid-rewrite must never leave a half-written directory where
    partition discovery can see it.  The directory name is unique per pass
    (``<table>.staging-<token>``) so concurrent service passes cannot
    clobber each other's staging; stale staging from crashed runs is swept
    here, age-gated by ``min_age_sec`` with the same reasoning as
    gc_unreferenced (a YOUNG sibling staging dir may belong to a pass that
    is still running).  Staged files are always redoable (the manifest
    still references every live file until the commit), so sweeping a
    genuinely dead run's staging loses nothing."""
    import time
    import uuid

    prefix = posixpath.basename(path.rstrip("/")) + ".staging-"
    parent = posixpath.dirname(path.rstrip("/"))
    fs, jvm = _fs(spark, path)
    now_ms = time.time() * 1000.0
    for st in _ls(fs, jvm, parent):
        name = st.getPath().getName()
        if name.startswith(prefix) and (
            min_age_sec <= 0
            or now_ms - st.getModificationTime() >= min_age_sec * 1000.0
        ):
            fs.delete(st.getPath(), True)
    staging = path.rstrip("/") + f".staging-{uuid.uuid4().hex}"
    fs.mkdirs(_jpath(jvm, staging))
    return staging


def _commit_service_pass(
    spark: SparkSession,
    path: str,
    version: int,
    files: list[str],
    staged: dict[str, str],
    drop: set[str],
    failpoint: Failpoint,
    keep_versions: int = 1,
    staging: str | None = None,
) -> None:
    """Publish a service pass: rename each staged partition's new files into
    the live table, commit manifest ``version+1`` (old files minus replaced/
    dropped partitions plus the new files), then garbage-collect.  Until the
    manifest rename lands, every file of version N remains on disk and
    referenced — a kill anywhere in here loses nothing."""
    fs, jvm = _fs(spark, path)
    new_files: list[str] = []
    for p, sdir in staged.items():
        pdir = f"p_date={p}"
        fs.mkdirs(_jpath(jvm, path, pdir))
        for st in _ls(fs, jvm, sdir):
            fname = st.getPath().getName()
            if not fname.endswith(".parquet"):
                continue
            dest = _jpath(jvm, path, pdir, fname)
            if fs.exists(dest) or not fs.rename(st.getPath(), dest):
                raise IOError(f"publish rename failed: {pdir}/{fname}")
            new_files.append(f"{pdir}/{fname}")
    failpoint("published")

    replaced = set(staged) | drop
    survivors = [
        f for f in files if f.split("/", 1)[0].split("=", 1)[1] not in replaced
    ]
    commit_manifest(spark, path, version + 1, survivors + new_files)
    failpoint("committed")

    gc_unreferenced(spark, path, keep_versions)
    if staging is not None:
        sp = _jpath(jvm, staging)
        if fs.exists(sp):
            fs.delete(sp, True)


def _partition_files(path: str, files: list[str], p: str) -> list[str]:
    """Absolute paths of version-``files`` belonging to partition ``p`` —
    services read exactly the committed file set, so orphans left by a
    crashed pass can never double-count into a rewrite."""
    return [posixpath.join(path, f) for f in files if f.startswith(f"p_date={p}/")]


# --- the services ------------------------------------------------------------


def apply_time_retention(
    spark: SparkSession,
    path: str,
    cutoff: str,
    keep_versions: int = 1,
    orphan_age_sec: float = 0.0,
    _failpoint: Failpoint = _NOOP,
) -> None:
    """DELETE WHERE ts < cutoff over the date-partitioned sink, with
    partition-drop semantics: partitions wholly before the cutoff's DATE
    leave the manifest without a single row being read (their directories go
    at GC time), the one partition a mid-day cutoff straddles is rewritten
    with a row filter, and every later partition's files are byte-for-byte
    untouched.  At 100 TB the drop is one manifest line per expired day;
    only ~one day of data is ever rewritten regardless of table size.
    Crash-safe per the module protocol: sources outlive their replacements
    until the manifest commit.  ``orphan_age_sec``: see gc_unreferenced —
    set it above the longest pass duration when passes may race; the loser
    of a racing commit raises ManifestConflictError (re-run to apply)."""
    version, files, fresh = _open_service(spark, path, keep_versions, orphan_age_sec)
    _failpoint("recovered")

    cutoff_date = cutoff.split(" ")[0]
    parts = sorted({f.split("/", 1)[0].split("=", 1)[1] for f in files})
    drop = {p for p in parts if p < cutoff_date}

    staging = _staging_dir(spark, path, min_age_sec=orphan_age_sec)
    staged: dict[str, str] = {}
    if cutoff_date in parts:
        # rewrite ONLY the straddled partition: filter into staging — later
        # partitions are never opened
        sdir = posixpath.join(staging, f"p_date={cutoff_date}")
        (
            spark.read.parquet(*_partition_files(path, files, cutoff_date))
            .filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
            .write.parquet(sdir)
        )
        staged[cutoff_date] = sdir
    _failpoint("staged")

    _commit_service_pass(
        spark, path, version, files, staged, drop, _failpoint, keep_versions,
        staging=staging,
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    max_files: int = 4,
    target_file_bytes: int = TARGET_FILE_BYTES,
    keep_versions: int = 1,
    orphan_age_sec: float = 0.0,
    _failpoint: Failpoint = _NOOP,
) -> list[str]:
    """Small-file compaction over the date-partitioned sink (the OPTIMIZE
    analog): every partition holding more than ``max_files`` parquet files
    is rewritten as ceil(partition_bytes / target_file_bytes) files
    range-partitioned and sorted on (channel_id, id); partitions at or under
    the threshold are left byte-for-byte untouched.  Returns the compacted
    partition values.

    Streaming appends fragment the sink (one file per micro-batch per
    partition); scan cost then pays per-file open/footer overhead and loses
    row-group channel locality.  The size target matters at 100 TB: a hot
    day-partition is multi-TB, and a coalesce(1) rewrite would serialize it
    into one writer task and one unsplittable-in-practice giant file —
    range-splitting by (channel_id, id) keeps rewrite parallelism AND gives
    each output file a disjoint channel range (file-level min/max stats
    prune whole files for per-channel reads).  Partition discovery and the
    swap go through the Hadoop FS API, so the service runs unchanged against
    HDFS/S3A.  Idempotent and crash-safe per the module protocol;
    ``orphan_age_sec``: see apply_time_retention."""
    from concurrent.futures import ThreadPoolExecutor

    version, files, fresh = _open_service(spark, path, keep_versions, orphan_age_sec)
    _failpoint("recovered")

    # Size from the COMMITTED manifest, not a directory listing: with
    # keep_versions > 1 the directory also holds retained older-version
    # files, which would inflate per-partition file counts (spurious
    # rewrites of already-compact partitions) and byte totals (oversized
    # nfiles targets).  The manifest is the live file set by definition;
    # only partitions actually over threshold get their files statted.
    manifest_parts: dict[str, list[str]] = {}
    for f in files:
        if f.startswith("p_date=") and f.endswith(".parquet"):
            manifest_parts.setdefault(
                f.split("/", 1)[0].split("=", 1)[1], []
            ).append(f)
    todo = sorted(p for p, fl in manifest_parts.items() if len(fl) > max_files)

    fs, jvm = _fs(spark, path)
    part_bytes = {
        p: sum(
            fs.getFileStatus(_jpath(jvm, path, f)).getLen()
            for f in manifest_parts[p]
        )
        for p in todo
    }

    staging = _staging_dir(spark, path, min_age_sec=orphan_age_sec)

    # each rewrite stages into its own directory, so the per-partition jobs
    # are independent — run them as concurrent Spark jobs (a sequential loop
    # pays one job-submission latency per partition)
    def rewrite(p: str) -> tuple[str, str]:
        sdir = posixpath.join(staging, f"p_date={p}")
        nbytes = part_bytes[p]
        nfiles = max(1, -(-nbytes // target_file_bytes))
        src = spark.read.parquet(*_partition_files(path, files, p))
        if nfiles == 1:
            # shuffle-free path for the common case: range-partitioning into
            # one file would still pay the RangePartitioner sampling job
            out = src.coalesce(1)
        else:
            out = src.repartitionByRange(nfiles, "channel_id", "id")
        out.sortWithinPartitions("channel_id", "id").write.parquet(sdir)
        return p, sdir

    with ThreadPoolExecutor(max_workers=8) as pool:
        staged = dict(pool.map(rewrite, todo))
    _failpoint("staged")

    _commit_service_pass(
        spark, path, version, files, staged, set(), _failpoint, keep_versions,
        staging=staging,
    )
    return todo


def decimal_cast_projection(df: DataFrame) -> DataFrame:
    """The JDBC-boundary projection: ``value`` double -> decimal(25,6), the
    reference's column type (/root/reference/db_model.py:54).  Factored out
    of write_channel_data_jdbc so the cast semantics (round-half-even at 6
    fractional digits, 19 integer digits of headroom) are testable without a
    database — inside the engine values stay double (see DIVERGENCES.md);
    this cast happens only at the external-sink boundary."""
    return df.withColumn("value", F.col("value").cast("decimal(25,6)"))


def write_channel_data_jdbc(
    df: DataFrame,
    url: str,
    table: str = "channel_data",
    mode: str = "append",
    batchsize: int = 10_000,
) -> None:
    """The reference's actual sink: a SQL database over JDBC
    (/root/reference/db_model.py:65-67 builds a MySQL URL; one INSERT+COMMIT
    per row, daq-3i.py:274-281).  Here: executor-parallel batched writes,
    with the decimal(25,6) cast applied at this boundary via
    :func:`decimal_cast_projection`.

    Exercised end-to-end against a REAL embedded JDBC database (Derby, the
    jar Spark bundles for its Hive metastore) in
    tests/test_sink_services.py::test_jdbc_sink_roundtrip_derby — table
    auto-creation, batched append, and the decimal cast all run through the
    actual Spark JDBC writer.  A server-backed deployment only swaps the URL
    (e.g. ``jdbc:mysql://host/db``) and ships that server's driver jar; the
    cast projection is additionally oracled standalone
    (tests/test_sink_services.py::test_decimal_cast_projection_boundary).
    """
    (
        decimal_cast_projection(df)
        .write.mode(mode)
        .option("batchsize", str(batchsize))
        .jdbc(url, table)
    )


def upsert_status_jdbc(
    updates: DataFrame, url: str, table: str = "daq_status"
) -> int:
    """Live JDBC twin of the daq_status upsert: latest update per
    ``parameter`` wins, MERGEd into the status table as batched
    UPDATE-then-INSERT (the reference's SELECT -> INSERT-or-UPDATE loop,
    daq_status.py:36-68, minus its one-transaction-per-parameter shape).

    The distributed part is the snapshot reduction (one shuffle on the key,
    operators/core.py:status_snapshot); the collected snapshot is
    PARAMETER-sized — one row per status key (heartbeat + per-channel
    flags), bounded by config cardinality, never by data volume — the same
    class as the module's day-list collects.  The merge itself runs on one
    JDBC connection as two executeBatch round trips (UPDATE all keys, INSERT
    the misses), which is dialect-neutral: Derby (exercised in
    tests/test_sink_services.py::test_status_upsert_roundtrip_derby), MySQL
    (the reference's production dialect — no server in the sandbox), and
    Postgres all take this shape.  Every statement is rendered by
    sources/dialect.py from the URL's dialect, so the EXACT strings a MySQL
    deployment would execute are golden-pinned in tests even though only
    the ANSI renderings run live here (see DIVERGENCES.md for the residue).
    Returns the number of keys merged.
    """
    from daq_3i_spark.operators.core import status_snapshot
    from daq_3i_spark.sources.dialect import (
        dialect_of_url,
        status_create_table_sql,
        status_insert_sql,
        status_select_keys_sql,
        status_update_sql,
    )

    dialect = dialect_of_url(url)

    snap = status_snapshot(updates).select("parameter", "status", "ts").collect()
    if not snap:
        return 0
    spark = updates.sparkSession
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        meta = conn.getMetaData()
        # table probe via DatabaseMetaData (dialect-neutral; Derby folds
        # unquoted identifiers to upper case, MySQL keeps case)
        rs = meta.getTables(None, None, table.upper(), None)
        exists = rs.next()
        rs.close()
        if not exists:
            rs = meta.getTables(None, None, table, None)
            exists = rs.next()
            rs.close()
        if not exists:
            # quoted column identifiers so the engine keeps the exact
            # lower-case names the Spark JDBC reader expects (Derby folds
            # unquoted identifiers to UPPER); quoting style comes from the
            # dialect renderer — ANSI double quotes vs MySQL backticks
            st = conn.createStatement()
            st.executeUpdate(status_create_table_sql(dialect, table))
            st.close()

        def _bind(ps, row, order):
            for i, fld in enumerate(order, start=1):
                if fld == "parameter":
                    ps.setString(i, row["parameter"])
                elif fld == "status":
                    ps.setInt(i, int(row["status"]))
                else:
                    # wall-clock binding (Timestamp.valueOf), NOT epoch math:
                    # collect() returns naive session-tz datetimes and
                    # datetime.timestamp() would reinterpret them in the
                    # HOST timezone — valueOf round-trips the wall clock
                    # through JDBC with no tz conversion on either side
                    ps.setTimestamp(
                        i,
                        jvm.java.sql.Timestamp.valueOf(
                            row["ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
                        ),
                    )

        # split updates/inserts from an existing-keys probe, NOT from
        # executeBatch update counts: the JDBC spec lets drivers return
        # SUCCESS_NO_INFO (-2) per statement (MySQL does under
        # rewriteBatchedStatements), which would silently drop the INSERT
        # half.  The key probe is one metadata-sized SELECT — the status
        # table holds one row per parameter by design.
        existing = set()
        st = conn.createStatement()
        rs = st.executeQuery(status_select_keys_sql(dialect, table))
        while rs.next():
            existing.add(rs.getString(1))
        rs.close()
        st.close()
        updates_b = [row for row in snap if row["parameter"] in existing]
        missing = [row for row in snap if row["parameter"] not in existing]
        if updates_b:
            upd = conn.prepareStatement(status_update_sql(dialect, table))
            for row in updates_b:
                _bind(upd, row, ("status", "ts", "parameter"))
                upd.addBatch()
            upd.executeBatch()
            upd.close()
        if missing:
            ins = conn.prepareStatement(status_insert_sql(dialect, table))
            for row in missing:
                _bind(ins, row, ("parameter", "status", "ts"))
                ins.addBatch()
            ins.executeBatch()
            ins.close()
        conn.commit()
        return len(snap)
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


# --- Z-order (Morton) clustering — multi-dimensional pruning layout ----------


def morton_code(a, b, bits: int = 10):
    """Morton (Z-order) interleave of two non-negative integer columns into
    one sort key: bit i of ``a`` lands at position 2i+1, bit i of ``b`` at
    2i.  Sorting by the interleaved code clusters rows so that EVERY file's
    (min, max) box is tight in BOTH dimensions — a single-column sort gives
    perfect pruning on that column and none on the other; Z-order gives
    useful pruning on both (the OPTIMIZE ZORDER BY idea).  Pure Catalyst
    bit arithmetic (2*bits shift/and/or terms), whole-stage codegen, no
    UDF."""
    code = None
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        bbit = F.shiftleft(
            F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        term = abit.bitwiseOR(bbit)
        code = term if code is None else code.bitwiseOR(term)
    return code


#: bit width of the hour-of-month dimension (0..743 = 31 days x 24 hours)
_HOUR_BITS = 10


def write_channel_data_zordered(
    df: DataFrame, path: str, nfiles: int = 8, ch_bits: int | None = None
) -> None:
    """channel_data laid out for BOTH per-channel and per-time-range reads:
    rows range-partitioned and sorted by the Morton interleave of
    (channel_id, hour-of-month), so each of the ``nfiles`` output files owns
    a compact box in (channel, time) space and parquet min/max stats prune
    files for either predicate.  A channel-only sort would leave every file
    spanning the full time range (time scans read everything); a time-only
    sort the reverse.  At 100 TB this runs per date partition as the
    clustering step of the compaction service."""
    hour = (F.dayofmonth("ts") - 1) * 24 + F.hour("ts")
    # LEFT-ALIGN the narrower dimension to the shared interleave width:
    # interleaving unaligned values puts the wider dimension's high bits
    # above every bit of the narrower one — degenerating into a
    # single-dimension sort with zero pruning on the other (measured before
    # alignment: a channel predicate admitted all 8 files).  The channel
    # width must match the DATA rather than a hard-coded constant: a fixed
    # shift of 4 silently aliased distinct channels into the same z-range
    # for any deployment with >= 64 channels, turning the layout into a
    # time-only sort exactly where two-dimensional pruning matters most.
    # Steady-state writers pass ``ch_bits`` (the channel dimension is config
    # metadata — its id width is known without touching the fact table, and
    # a too-wide value only pads the interleave, never aliases); with None
    # the width is derived by one max aggregate over the input (the r9
    # fallback, one extra job per write — BENCH_NOTES r10 adjudication).
    if ch_bits is None:
        max_ch = df.agg(F.max("channel_id")).first()[0] or 0
        ch_bits = int(max_ch).bit_length()
    ch_bits = max(1, ch_bits)
    bits = min(31, max(ch_bits, _HOUR_BITS))  # 2*31 interleaved bits < 63
    z = morton_code(
        F.shiftleft(F.col("channel_id").cast("long"), max(0, bits - ch_bits)),
        F.shiftleft(hour.cast("long"), bits - _HOUR_BITS),
        bits=bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(nfiles, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key: str = "id",
    keep_versions: int = 1,
    orphan_age_sec: float = 0.0,
    _failpoint: Failpoint = _NOOP,
) -> list[str]:
    """MERGE INTO the date-partitioned sink ON ``key``: matched target rows
    are replaced by the source row (update), unmatched source rows are
    inserted — the Delta ``MERGE`` primitive, run as a manifest service
    pass.  Only partitions named by the source's ``to_date(ts)`` are
    rewritten; every other partition's files stay byte-for-byte (the CDC
    upsert shape: the touched-day set is the batch's days, not the
    table's).  Assumes key->partition stability — the source carries the
    target row's day, as CDC feeds do; a cross-partition key move is a
    delete+insert, not a merge.  Crash-safe per the module protocol.
    Returns the rewritten partition values.  ``orphan_age_sec``: see
    apply_time_retention."""
    version, files, fresh = _open_service(spark, path, keep_versions, orphan_age_sec)
    _failpoint("recovered")

    src = source.withColumn("p_date", F.to_date("ts")).persist()
    # the day list is batch-sized metadata (one row per touched day), the
    # standard parameter-sized collect
    days = sorted(str(r["p_date"]) for r in src.select("p_date").distinct().collect())

    staging = _staging_dir(spark, path, min_age_sec=orphan_age_sec)

    # per-day rewrites are independent — run them as concurrent Spark jobs
    # (a sequential loop pays one job-submission latency per touched day)
    def rewrite(pstr: str) -> tuple[str, str]:
        sdir = posixpath.join(staging, f"p_date={pstr}")
        s_d = src.filter(F.col("p_date") == F.lit(pstr).cast("date")).drop("p_date")
        pfiles = _partition_files(path, files, pstr)
        if pfiles:
            tgt = spark.read.parquet(*pfiles)
            out = tgt.join(s_d.select(key), key, "left_anti").unionByName(s_d)
        else:
            out = s_d
        out.coalesce(1).sortWithinPartitions("channel_id", "id").write.parquet(sdir)
        return pstr, sdir

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        staged = dict(pool.map(rewrite, days))
    src.unpersist()
    _failpoint("staged")

    _commit_service_pass(
        spark, path, version, files, staged, set(), _failpoint, keep_versions,
        staging=staging,
    )
    return days
