"""SURVEY.md §2.1–2.7 — the reference's operator inventory as Spark plans.

Every dataflow stage / implicit relational op of the reference daemon
(/root/reference/daq-3i.py, bus.py, daq_status.py) has a batch analog here,
expressed declaratively so Catalyst does pushdown/pruning/broadcast for free,
plus a DuckDB oracle.  The DAQ config dims are synthesized deterministically
(sources/daq_dims.py) and ``channel_data`` is the FIXTURES.md §A.6 view over
the driver's ``events`` table.

Scale notes are in each op's docstring where non-obvious; the common shape is
fact-side shuffle on ``channel_id`` only when a window/agg needs it, config
dims always broadcast (a few KB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daq_3i_spark.functions.convert import convert_case_column, convert_case_duckdb
from daq_3i_spark.functions.decode import decode_cols, decode_sql_duckdb
from daq_3i_spark.operators.core import oldest_n_per_key
from daq_3i_spark.functions.numeric import fx_sum
from daq_3i_spark.plans.registry import register
from daq_3i_spark.sources.tables import load_events
from daq_3i_spark.sources.daq_dims import (
    buses_df,
    channel_data_df,
    channels_df,
    conversions_df,
    conversions_rows,
    dims_cte_sql,
)

_D = dims_cte_sql()
_CONVS = [(cid, expr) for cid, _name, expr in conversions_rows()]



def _cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_data_df(spark, sf_dir)


def _enabled_channels(spark: SparkSession) -> DataFrame:
    return channels_df(spark).filter(F.col("enabled"))


# --- §2.1 sources / scans / sinks --------------------------------------------


@register(
    "op_scan_config_buses",
    f"WITH {_D} SELECT id, name, protocol, address, port, timeout FROM buses WHERE enabled",
    doc="startup scan of enabled buses (daq-3i.py:131)",
)
def op_scan_config_buses(spark: SparkSession, sf_dir: str) -> DataFrame:
    return buses_df(spark).filter(F.col("enabled")).select(
        "id", "name", "protocol", "address", "port", "timeout"
    )


@register(
    "op_scan_config_channels",
    f"""WITH {_D}
    SELECT c.id, c.name, c.bus_id, c.device_id, c.address, c.timing,
           c.conversion_id, c.func_code, c.format_code, c.eng_unit, c.history_len
    FROM channels c JOIN buses b ON c.bus_id = b.id AND b.enabled
    WHERE c.enabled""",
    doc="per-bus channel scan folded into one join (daq-3i.py:145; N+1 eliminated)",
)
def op_scan_config_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark)
    b = buses_df(spark).filter(F.col("enabled")).select(F.col("id").alias("bus_id"))
    return c.join(F.broadcast(b), "bus_id").select(
        "id", "name", "bus_id", "device_id", "address", "timing",
        "conversion_id", "func_code", "format_code", "eng_unit", "history_len",
    )


@register(
    "op_source_modbus_poll",
    f"WITH {_D} SELECT id, channel_id, ts, value FROM channel_data",
    doc="the acquisition feed adapter: events replayed as raw samples "
    "(modbus.py:37-56 batch analog; live source in streaming/modbus_source.py)",
)
def op_source_modbus_poll(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cd(spark, sf_dir)


@register(
    "op_scan_channel_data",
    f"WITH {_D} SELECT id, channel_id, ts, value FROM channel_data WHERE channel_id = 7",
    doc="point scan by channel (daq-3i.py:198,209); partition pruning at scale",
)
def op_scan_channel_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cd(spark, sf_dir).filter(F.col("channel_id") == 7)


@register(
    "op_sink_append_channel_data",
    f"""WITH {_D},
    joined AS (
      SELECT cd.id, cd.channel_id, cd.ts, cd.value, c.conversion_id
      FROM channel_data cd JOIN channels c ON cd.channel_id = c.id AND c.enabled
    )
    SELECT id, channel_id, ts,
           {convert_case_duckdb(_CONVS, "conversion_id", "value")} AS value
    FROM joined""",
    doc="the micro-batch that replaces per-row INSERT+COMMIT (daq-3i.py:274-281): "
    "decode/convert applied, cast to the sink type decimal(25,6) (db_model.py:54)",
)
def op_sink_append_channel_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark).select(
        F.col("id").alias("channel_id"), "conversion_id"
    )
    return (
        _cd(spark, sf_dir)
        .join(F.broadcast(c), "channel_id")
        .select(
            "id",
            "channel_id",
            "ts",
            convert_case_column(_CONVS, F.col("conversion_id"), "value").alias("value"),
        )
    )


@register(
    "op_sink_upsert_status",
    f"""WITH ranked AS (
      SELECT event_type AS parameter, 1 AS status, ts,
             row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) SELECT parameter, CAST(status AS INTEGER) AS status, ts FROM ranked WHERE rn = 1""",
    doc="daq_status upsert batch analog: latest update per key wins "
    "(daq_status.py:36-68); streaming twin is a foreachBatch MERGE",
)
def op_sink_upsert_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_events(spark, sf_dir)
    # latest-wins as a map-side-combinable max-struct aggregate (r13):
    # event_type is LOW-cardinality while events are data-sized, so the
    # previous row_number window put one type's entire history through one
    # task; lexicographic max(struct(ts, event_id)) realizes the same
    # (desc ts, desc event_id) winner with partial aggregation on every
    # core — the same shape the streaming twin's MERGE uses per batch
    return (
        events.groupBy(F.col("event_type").alias("parameter"))
        .agg(F.max(F.struct("ts", "event_id")).alias("__s"))
        .select(
            "parameter",
            F.lit(1).cast("int").alias("status"),
            F.col("__s.ts").alias("ts"),
        )
    )


@register(
    "op_sink_truncate_status",
    "SELECT CAST(NULL AS VARCHAR) AS parameter, CAST(NULL AS INTEGER) AS status, "
    "CAST(NULL AS TIMESTAMP) AS ts WHERE FALSE",
    doc="startup status flush = truncate (daq_status.py:19-33): empty overwrite set",
)
def op_sink_truncate_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_events(spark, sf_dir)
    return events.select(
        F.col("event_type").alias("parameter"),
        F.lit(1).cast("int").alias("status"),
        "ts",
    ).limit(0)


@register(
    "op_sink_delete_retention",
    f"""WITH {_D},
    ranked AS (
      SELECT cd.id, cd.channel_id,
             row_number() OVER (PARTITION BY cd.channel_id ORDER BY cd.id DESC) AS rn,
             c.history_len
      FROM channel_data cd JOIN channels c ON cd.channel_id = c.id
    ) SELECT id, channel_id FROM ranked WHERE rn > history_len""",
    doc="retention delete set, one statement (vs daq-3i.py:207-215 row loop, "
    "no 100-row batch cap — SURVEY §2.9.5).  Drop = id strictly below the "
    "per-channel keep threshold (retention_min_keep_ids, r13) — ids are "
    "unique, so rn > history_len and id < __min_keep select identical "
    "rows, with no per-channel window over the fact",
)
def op_sink_delete_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.core import retention_min_keep_ids

    cd = _cd(spark, sf_dir)
    # channel-config-cardinality frame (<1 KB) — hint is scale-safe
    thr = F.broadcast(retention_min_keep_ids(cd, channels_df(spark)))
    return (
        cd.join(thr, "channel_id")
        .filter(F.col("id") < F.col("__min_keep"))
        .select("id", "channel_id")
    )


# --- §2.2 projections / filters ----------------------------------------------


@register(
    "op_filter_enabled",
    f"""WITH {_D} SELECT id, name, bus_id, timing, format_code, history_len
    FROM channels WHERE enabled""",
    doc="enabled-flag predicate (daq-3i.py:131,145)",
)
def op_filter_enabled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _enabled_channels(spark).select(
        "id", "name", "bus_id", "timing", "format_code", "history_len"
    )


@register(
    "op_filter_due",
    f"""WITH {_D},
    seq AS (
      SELECT cd.id, cd.channel_id, cd.ts, c.timing,
             lag(epoch_us(cd.ts)) OVER (PARTITION BY cd.channel_id ORDER BY cd.ts, cd.id)
               AS prev_us
      FROM channel_data cd JOIN channels c ON cd.channel_id = c.id AND c.enabled
    )
    SELECT id, channel_id, ts FROM seq
    WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > CAST(timing AS BIGINT) * 1000000""",
    doc="per-channel sampling-interval predicate (bus.py:38-49): read due iff "
    "never read or gap > timing (strict). Batch analog = lag-based filter; "
    "streaming twin keeps last_read_at in state (streaming/stateful.py)",
)
def op_filter_due(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (channel, day)-bucketed lag with a calendar-bounded carry (r13; the
    # op_timeseries_*_multiday construction): the plain per-channel lag
    # window single-tasks each of the 40 config channels' entire history.
    # Within a day bucket the lag is local; the first row of each bucket
    # takes the channel's last timestamp from EARLIER days — a running max
    # over the per-(channel, day) max-us rollup, a frame bounded by
    # config x calendar, never by data.  Bit-identical: us within any
    # earlier day <= that day's max, so the carry IS the lag value the
    # unbounded window would have produced.
    c = _enabled_channels(spark).select(F.col("id").alias("channel_id"), "timing")
    cd = (
        _cd(spark, sf_dir)
        .join(F.broadcast(c), "channel_id")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn("__d", F.to_date("ts"))
    )
    w_in = Window.partitionBy("channel_id", "__d").orderBy("ts", "id")
    roll = cd.groupBy("channel_id", "__d").agg(F.max("us").alias("__dmax"))
    w_days = (
        Window.partitionBy("channel_id")
        .orderBy("__d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = roll.select(
        "channel_id", "__d", F.max("__dmax").over(w_days).alias("__carry")
    )
    df = cd.withColumn("prev_in", F.lag("us").over(w_in)).join(
        F.broadcast(carry), ["channel_id", "__d"]
    ).withColumn("prev_us", F.coalesce("prev_in", "__carry"))
    return df.filter(
        F.col("prev_us").isNull()
        | (F.col("us") - F.col("prev_us") > F.col("timing").cast("long") * 1000000)
    ).select("id", "channel_id", "ts")


@register(
    "op_filter_dirty",
    f"""WITH {_D}
    SELECT id, channel_id, ts, value FROM channel_data
    WHERE ts > (SELECT max(ts) - INTERVAL 1 HOUR FROM channel_data)""",
    doc="change-data filter (is_dirty analog, bus.py:36): rows newer than the "
    "last persist checkpoint (here: high-watermark minus 1h)",
)
def op_filter_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    cd = _cd(spark, sf_dir)
    hwm = cd.agg(F.max("ts").alias("max_ts"))
    return (
        cd.crossJoin(F.broadcast(hwm))
        .filter(F.col("ts") > F.col("max_ts") - F.expr("INTERVAL 1 HOUR"))
        .select("id", "channel_id", "ts", "value")
    )


@register(
    "op_project_columns",
    f"WITH {_D} SELECT id FROM channel_data",
    doc="narrow projection (daq-3i.py:198,209); Catalyst prunes the parquet scan "
    "to the single column",
)
def op_project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cd(spark, sf_dir).select("id")


@register(
    "op_filter_status_key",
    f"""WITH {_D}
    SELECT concat('CHL: ', CAST(channel_id AS VARCHAR)) AS parameter,
           CAST(1 AS INTEGER) AS status, max(ts) AS ts
    FROM channel_data GROUP BY channel_id
    HAVING concat('CHL: ', CAST(channel_id AS VARCHAR)) = 'CHL: 7'""",
    doc="point lookup parameter = ? on the status snapshot (daq_status.py:44-47)",
)
def op_filter_status_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cd(spark, sf_dir)
        .groupBy("channel_id")
        .agg(F.max("ts").alias("ts"))
        .select(
            F.concat(F.lit("CHL: "), F.col("channel_id").cast("string")).alias("parameter"),
            F.lit(1).cast("int").alias("status"),
            "ts",
        )
        .filter(F.col("parameter") == "CHL: 7")
    )


# --- §2.3 joins ----------------------------------------------------------------


@register(
    "op_join_channels_buses",
    f"""WITH {_D}
    SELECT c.id AS channel_id, c.name AS channel_name, b.id AS bus_id,
           b.name AS bus_name, b.address AS bus_address, b.port AS port
    FROM channels c JOIN buses b ON c.bus_id = b.id AND b.enabled
    WHERE c.enabled""",
    doc="channels⋈buses broadcast hash join (app-level loop daq-3i.py:135-159 "
    "becomes one join)",
)
def op_join_channels_buses(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark)
    b = buses_df(spark).filter(F.col("enabled"))
    return c.join(F.broadcast(b), c.bus_id == b.id, "inner").select(
        c.id.alias("channel_id"),
        c.name.alias("channel_name"),
        b.id.alias("bus_id"),
        b.name.alias("bus_name"),
        b.address.alias("bus_address"),
        b.port.alias("port"),
    )


@register(
    "op_join_channels_conversions",
    f"""WITH {_D}
    SELECT c.id AS channel_id, c.conversion_id, v.expr AS expr
    FROM channels c LEFT JOIN conversions v ON c.conversion_id = v.id
    WHERE c.enabled""",
    doc="lazy FK traversal chl.conversion.expr as a null-tolerant left join "
    "(daq-3i.py:150-153); conversion_id 0/NULL -> no conversion",
)
def op_join_channels_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark)
    v = conversions_df(spark)
    return c.join(F.broadcast(v), c.conversion_id == v.id, "left").select(
        c.id.alias("channel_id"), c.conversion_id, v.expr.alias("expr")
    )


@register(
    "op_join_data_channels",
    f"""WITH {_D},
    counts AS (SELECT channel_id, count(*) AS n_rows FROM channel_data GROUP BY channel_id)
    SELECT k.channel_id, k.n_rows, c.history_len,
           CAST(greatest(k.n_rows - c.history_len, 0) AS BIGINT) AS to_del
    FROM counts k JOIN channels c ON k.channel_id = c.id""",
    doc="fact-aggregate ⋈ dimension: the truncate loop's per-channel count + "
    "history_len (daq-3i.py:191-209) as ONE statement (the file's own comment "
    "at :176-178 asks for exactly this)",
)
def op_join_data_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _cd(spark, sf_dir).groupBy("channel_id").agg(F.count("*").alias("n_rows"))
    c = channels_df(spark).select(F.col("id").alias("channel_id"), "history_len")
    return counts.join(F.broadcast(c), "channel_id").select(
        "channel_id",
        "n_rows",
        "history_len",
        F.greatest(F.col("n_rows") - F.col("history_len"), F.lit(0)).cast("long").alias("to_del"),
    )


@register(
    "op_join_enrich_stream",
    f"""WITH {_D}
    SELECT cd.id, cd.channel_id, c.name AS channel_name, c.eng_unit, cd.ts, cd.value
    FROM channel_data cd JOIN channels c ON cd.channel_id = c.id AND c.enabled""",
    doc="stream-static enrichment join (ChannelState metadata carry, bus.py:15-25); "
    "the dim side is broadcast — no fact shuffle",
)
def op_join_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark).select(
        F.col("id").alias("channel_id"), F.col("name").alias("channel_name"), "eng_unit"
    )
    return _cd(spark, sf_dir).join(F.broadcast(c), "channel_id").select(
        "id", "channel_id", "channel_name", "eng_unit", "ts", "value"
    )


# --- §2.4 aggregations -----------------------------------------------------------


@register(
    "op_count_per_channel",
    f"WITH {_D} SELECT channel_id, count(*) AS n_rows FROM channel_data GROUP BY channel_id",
    doc="COUNT per channel (daq-3i.py:198); hash aggregate, map-side partials",
)
def op_count_per_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cd(spark, sf_dir).groupBy("channel_id").agg(F.count("*").alias("n_rows"))


@register(
    "op_latest_per_channel",
    f"""WITH {_D},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY channel_id ORDER BY ts DESC, id DESC) AS rn
      FROM channel_data
    ) SELECT id, channel_id, ts, value FROM ranked WHERE rn = 1""",
    doc="latest-wins slot (ChannelState overwrite, bus.py:32-36) as ONE "
    "map-side-combinable max-struct aggregate (r13): lexicographic "
    "max(struct(ts, id, value)) realizes the (ts DESC, id DESC) winner "
    "with partial aggregation on every core — a per-channel window would "
    "single-task each of the 40 channels' whole history; streaming twin = "
    "state store",
)
def op_latest_per_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # id is unique, so the struct comparison never reaches value — the
    # trailing field only rides along to be emitted
    return (
        _cd(spark, sf_dir)
        .groupBy("channel_id")
        .agg(F.max(F.struct("ts", "id", "value")).alias("__s"))
        .select(
            F.col("__s.id").alias("id"),
            "channel_id",
            F.col("__s.ts").alias("ts"),
            F.col("__s.value").alias("value"),
        )
    )


# --- §2.5 sorts / limits / top-k ---------------------------------------------------


@register(
    "op_oldest_n_per_channel",
    f"""WITH {_D},
    ranked AS (
      SELECT id, channel_id, row_number() OVER (PARTITION BY channel_id ORDER BY id ASC) AS rn
      FROM channel_data
    ) SELECT id, channel_id FROM ranked WHERE rn <= 5""",
    doc="bottom-k per group (delete-candidate scan, daq-3i.py:209)",
)
def op_oldest_n_per_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return oldest_n_per_key(_cd(spark, sf_dir), "channel_id", "id", 5).select("id", "channel_id")


@register(
    "op_retention_topk",
    f"""WITH {_D},
    ranked AS (
      SELECT cd.id, cd.channel_id, cd.ts, cd.value, c.history_len,
             row_number() OVER (PARTITION BY cd.channel_id ORDER BY cd.id DESC) AS rn
      FROM channel_data cd JOIN channels c ON cd.channel_id = c.id
    ) SELECT id, channel_id, ts, value FROM ranked WHERE rn <= history_len""",
    doc="retention keep-set: newest history_len rows per channel "
    "(daq-3i.py:193-215, set-based, uncapped).  Runs on the shared "
    "retention_keep operator — the two-phase mergeable top-n (r13), never "
    "a per-channel window: 40 channels over the whole fact would "
    "single-task each channel's history",
)
def op_retention_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.core import retention_keep

    return retention_keep(_cd(spark, sf_dir), channels_df(spark)).select(
        "id", "channel_id", "ts", "value"
    )


# --- §2.7 scalar functions / UDFs / stateful behaviors -----------------------------


def _with_regs(df: DataFrame) -> DataFrame:
    """Deterministic register words derived from the sample id (test fixture:
    the driver tables carry no raw registers, so synthesize uint16 words).

    Projected as three scalar columns — not an array — so the decode CASE
    references codegen locals (see functions/decode.py:decode_cols)."""
    rid = F.col("id")
    return (
        df.withColumn("r0", (rid % 65536).cast("int"))
        .withColumn("r1", ((rid * 7919) % 65536).cast("int"))
        .withColumn("r2", ((rid * 104729) % 65536).cast("int"))
    )


_REGS_SQL = ("(cd.id % 65536)", "((cd.id * 7919) % 65536)", "((cd.id * 104729) % 65536)")


@register(
    "op_decode_registers",
    f"""WITH {_D}
    SELECT cd.id, cd.channel_id, c.format_code,
           {decode_sql_duckdb("c.format_code", *_REGS_SQL)} AS value_decoded
    FROM channel_data cd
    JOIN channels c ON cd.channel_id = c.id AND c.enabled AND c.func_code = 3""",
    doc="register decode, 14 format codes (modbus.py:58-166) as pure Catalyst "
    "bit arithmetic incl. arithmetic IEEE-754 float decode — no Python in the "
    "hot path; reference bugs fixed per SURVEY §2.9 (see functions/decode.py)",
)
def op_decode_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark).filter(F.col("func_code") == 3).select(
        F.col("id").alias("channel_id"), "format_code"
    )
    return (
        _with_regs(_cd(spark, sf_dir).join(F.broadcast(c), "channel_id"))
        .select(
            "id",
            "channel_id",
            "format_code",
            decode_cols(
                F.col("format_code"), F.col("r0"), F.col("r1"), F.col("r2")
            ).alias("value_decoded"),
        )
    )


@register(
    "op_convert_expr",
    f"""WITH {_D},
    joined AS (
      SELECT cd.id, cd.channel_id, c.conversion_id, cd.value
      FROM channel_data cd JOIN channels c ON cd.channel_id = c.id AND c.enabled
    )
    SELECT id, channel_id, conversion_id,
           {convert_case_duckdb(_CONVS, "conversion_id", "value")} AS value_conv
    FROM joined""",
    doc="per-channel conversion expressions compiled to native Catalyst "
    "(conversion.py:7-16: asteval per-sample re-parse replaced by a "
    "compile-once CASE over conversion_id; malformed expr -> NULL)",
)
def op_convert_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark).select(F.col("id").alias("channel_id"), "conversion_id")
    return (
        _cd(spark, sf_dir)
        .join(F.broadcast(c), "channel_id")
        .select(
            "id",
            "channel_id",
            "conversion_id",
            convert_case_column(_CONVS, F.col("conversion_id"), "value").alias("value_conv"),
        )
    )


@register(
    "op_sign_extend",
    f"""WITH {_D}
    SELECT id,
           CAST(CASE WHEN id % 4096 >= 2048 THEN id % 4096 - 4096 ELSE id % 4096 END AS BIGINT)
             AS sx
    FROM channel_data""",
    doc="two's-complement sign extension (buscommon.py:12-19 — dead in the "
    "reference, implemented natively here; 12-bit example)",
)
def op_sign_extend(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("id") % 4096
    return _cd(spark, sf_dir).select(
        "id", F.when(v >= 2048, v - 4096).otherwise(v).cast("long").alias("sx")
    )


@register(
    "op_sched_tick",
    f"""WITH {_D}
    SELECT c.bus_id, date_trunc('second', cd.ts) AS tick, count(*) AS n_reads
    FROM channel_data cd JOIN channels c ON cd.channel_id = c.id AND c.enabled
    GROUP BY c.bus_id, date_trunc('second', cd.ts)""",
    doc="1 Hz acquisition tick occupancy per bus (daq-3i.py:233-260); in "
    "streaming this is Trigger.ProcessingTime('1 second')",
)
def op_sched_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _enabled_channels(spark).select(F.col("id").alias("channel_id"), "bus_id")
    return (
        _cd(spark, sf_dir)
        .join(F.broadcast(c), "channel_id")
        .groupBy("bus_id", F.date_trunc("second", "ts").alias("tick"))
        .agg(F.count("*").alias("n_reads"))
    )


@register(
    "op_heartbeat",
    """SELECT time_bucket(INTERVAL '15 seconds', ts) AS window_start, count(*) AS n
    FROM events GROUP BY 1""",
    doc="15 s heartbeat (daq-3i.py:163-171) as a tumbling-window count; "
    "streaming twin uses F.window + StreamingQueryListener",
)
def op_heartbeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_events(spark, sf_dir)
    return (
        events.groupBy(F.window("ts", "15 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@register(
    "op_status_per_channel",
    f"""WITH {_D}
    SELECT concat('CHL: ', CAST(channel_id AS VARCHAR)) AS parameter,
           CAST(1 AS INTEGER) AS status, max(ts) AS ts
    FROM channel_data GROUP BY channel_id""",
    doc="per-channel CHL status upsert after persist (daq-3i.py:284), grouped "
    "per key in the batch",
)
def op_status_per_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cd(spark, sf_dir)
        .groupBy("channel_id")
        .agg(F.max("ts").alias("ts"))
        .select(
            F.concat(F.lit("CHL: "), F.col("channel_id").cast("string")).alias("parameter"),
            F.lit(1).cast("int").alias("status"),
            "ts",
        )
    )


@register(
    "op_error_handling",
    f"""WITH {_D},
    decoded AS (
      SELECT cd.channel_id, c.func_code,
             CASE WHEN c.func_code <> 3 THEN NULL
                  ELSE {decode_sql_duckdb("c.format_code", *_REGS_SQL)} END AS v
      FROM channel_data cd JOIN channels c ON cd.channel_id = c.id
    )
    SELECT channel_id, count(*) AS n_errors
    FROM decoded WHERE v IS NULL GROUP BY channel_id""",
    doc="error side-channel (bus.py:85-101, modbus.py:48-55): failed reads / "
    "undecodable payloads become NULL and route to a dead-letter aggregate "
    "instead of crashing the stream",
)
def op_error_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = channels_df(spark).select(F.col("id").alias("channel_id"), "func_code", "format_code")
    decoded = _with_regs(
        _cd(spark, sf_dir).join(F.broadcast(c), "channel_id")
    ).withColumn(
        "v",
        F.when(F.col("func_code") != 3, F.lit(None).cast("double")).otherwise(
            decode_cols(F.col("format_code"), F.col("r0"), F.col("r1"), F.col("r2"))
        ),
    )
    return decoded.filter(F.col("v").isNull()).groupBy("channel_id").agg(
        F.count("*").alias("n_errors")
    )


# --- flagship -------------------------------------------------------------------


FLAGSHIP_ORACLE = f"""WITH {_D},
joined AS (
  SELECT cd.id, cd.channel_id, cd.ts, cd.value,
         c.name AS channel_name, c.eng_unit, c.conversion_id, c.history_len
  FROM channel_data cd JOIN channels c ON cd.channel_id = c.id AND c.enabled
),
conv AS (
  SELECT *, {convert_case_duckdb(_CONVS, "conversion_id", "value")} AS vc FROM joined
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY channel_id ORDER BY id DESC) AS rn FROM conv
)
SELECT id, channel_id, channel_name, eng_unit, ts, value, vc AS value_conv
FROM ranked WHERE rn <= history_len"""


@register(
    "flagship_pipeline",
    FLAGSHIP_ORACLE,
    doc="the end-to-end acquisition slice as ONE DataFrame statement: feed scan "
    "-> broadcast enrich -> compiled conversion -> retention keep via the "
    "per-channel threshold join (retention_min_keep_ids, r13 — the fact "
    "never shuffles; the old per-channel id-desc window single-tasked each "
    "of the 40 channels' history) "
    "(SURVEY §3.1 realized in batch; streaming twin in streaming/pipeline.py)",
)
def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.core import retention_min_keep_ids

    c = _enabled_channels(spark).select(
        F.col("id").alias("channel_id"),
        F.col("name").alias("channel_name"),
        "eng_unit",
        "conversion_id",
        "history_len",
    )
    cd = _cd(spark, sf_dir)
    # channel-config-cardinality frame (<1 KB) — hint is scale-safe
    thr = F.broadcast(retention_min_keep_ids(cd, _enabled_channels(spark)))
    return (
        cd.join(F.broadcast(c), "channel_id")
        .withColumn(
            "value_conv",
            convert_case_column(_CONVS, F.col("conversion_id"), "value"),
        )
        .join(thr, "channel_id")
        .filter(F.col("id") >= F.col("__min_keep"))
        .select("id", "channel_id", "channel_name", "eng_unit", "ts", "value", "value_conv")
    )


@register(
    "op_join_salted",
    f"""WITH {_D}
    SELECT cd.id, cd.channel_id, cd.ts, cd.value, c.history_len
    FROM channel_data cd JOIN channels c ON cd.channel_id = c.id""",
    doc="the data⋈channels join executed SALTED (operators/skew.py): fact salt "
    "= id % 16, dim exploded 16x, join on (key, salt) — each hot channel's "
    "rows spread over 16 tasks. Result is provably identical to the plain "
    "join (the oracle IS the plain join); the pattern for skewed keys when "
    "the dim outgrows broadcast",
)
def op_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.skew import salted_join

    c = channels_df(spark).select(F.col("id").alias("channel_id"), "history_len")
    cd = _cd(spark, sf_dir)
    return salted_join(cd, c, "channel_id", F.col("id"), n_salt=16).select(
        "id", "channel_id", "ts", "value", "history_len"
    )


#: the full-recompute rollup SQL — also the oracle of op_rollup_incremental
#: (streaming_ops.py), whose incremental maintenance must equal a recompute
ROLLUP_HOURLY_SQL = f"""WITH {_D},
    b AS (
      SELECT channel_id, time_bucket(INTERVAL '1 hour', ts) AS bucket_ts, value
      FROM channel_data
    )
    SELECT channel_id, epoch_us(bucket_ts) AS bucket_us,
           count(*) AS n_samples,
           (CAST(CAST(SUM(CAST(FLOOR((value) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM b GROUP BY channel_id, bucket_ts"""


@register(
    "op_rollup_hourly",
    ROLLUP_HOURLY_SQL,
    doc="hypertable-style continuous aggregate: hourly per-channel rollup of "
    "channel_data (count/sum/min/max) — the materialized downsample a DAQ "
    "front-end reads instead of raw samples.  One hash aggregate with "
    "map-side partial combine, shuffled on (channel_id, bucket); at 100 TB "
    "this is an incrementally-refreshed table keyed by the same bucket "
    "(only buckets touched by new batches recompute — the foreachBatch "
    "epilogue writes them, exactly like the retention pass)",
)
def op_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_rollup(_cd(spark, sf_dir))


def hourly_rollup(cd: DataFrame) -> DataFrame:
    """The continuous-aggregate kernel, shared with op_rollup_incremental
    (which maintains the same table by invalidate-and-recompute)."""
    bucket = F.date_trunc("hour", F.col("ts"))
    return (
        cd.groupBy("channel_id", bucket.alias("bucket_ts"))
        .agg(
            F.count("*").alias("n_samples"),
            fx_sum(F.col("value")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "channel_id",
            F.unix_micros("bucket_ts").alias("bucket_us"),
            "n_samples",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


@register(
    "op_anomaly_rank",
    f"""WITH {_D},
    r AS (
      SELECT id, channel_id, ts, value,
             percent_rank() OVER (PARTITION BY channel_id
                                  ORDER BY value, id) AS pr
      FROM channel_data
    )
    SELECT id, channel_id, ts, value, pr FROM r WHERE pr >= 0.99""",
    doc="rank-based anomaly detection: samples at or above their channel's "
    "99th value percentile (percent_rank with the unique id tie-break, so "
    "the flag set is deterministic and the rank ratio is exact small-"
    "integer division — bit-portable, unlike mean/stddev z-scores whose "
    "float sums are order-dependent).  One window shuffle on channel_id; "
    "at 100 TB the exact rank swaps for the oracled histogram-quantile "
    "sketch threshold (op_sql_histogram_quantile) with the same output "
    "contract — flagged rows, not mutated state",
)
def op_anomaly_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cd = _cd(spark, sf_dir)
    w = Window.partitionBy("channel_id").orderBy("value", "id")
    return (
        cd.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.99)
        .select("id", "channel_id", "ts", "value", "pr")
    )


#: value-bucket width for the bucketed anomaly twin (values span 0..~560,
#: so ~112 buckets/channel — the histogram stays parameter-sized)
_ANOMB_W = 5.0


@register(
    "op_anomaly_rank_bucketed",
    f"""WITH {_D},
    r AS (
      SELECT id, channel_id, ts, value,
             percent_rank() OVER (PARTITION BY channel_id
                                  ORDER BY value, id) AS pr
      FROM channel_data
    )
    SELECT id, channel_id, ts, value, pr FROM r WHERE pr >= 0.99""",
    doc="hot-key-safe twin of op_anomaly_rank, SAME oracle (the global "
    "percent_rank window) — the proof that histogram-pruned two-pass rank "
    "== one unbounded per-channel window, bit for bit.  op_anomaly_rank's "
    "window is one task per channel (a straggler if one channel holds half "
    "the table); here pass 1 is a map-side-combinable per-(channel, value-"
    "bucket) histogram (tiny: channels x ~112 buckets), pass 2 broadcasts "
    "the qualifying buckets (integer cum-count prefilter at a safety margin "
    "below the 0.99 threshold, pruning ~99% of rows BEFORE any window), and "
    "the exact rank is reconstructed as bucket-cumulative-base + row_number "
    "over the (channel, bucket) partition — task size bounded by one value "
    "bucket of one channel regardless of how hot the channel is.  pr is the "
    "same (rank-1)/(n-1) double division percent_rank computes, so the "
    "final >= 0.99 comparison is bit-identical to the oracle's",
)
def op_anomaly_rank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_rank_bucketed(_cd(spark, sf_dir))


def anomaly_rank_bucketed(cd: DataFrame) -> DataFrame:
    """The histogram-pruned exact-rank kernel (see the op doc); factored so
    the hot-channel skew test can drive it on an adversarial fixture."""
    b = F.floor(F.col("value") / F.lit(_ANOMB_W)).cast("long")
    hist = cd.groupBy("channel_id", b.alias("bucket")).agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy("channel_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = hist.select(
        "channel_id",
        "bucket",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum_end"),
        F.sum("cnt").over(Window.partitionBy("channel_id")).alias("n"),
    ).withColumn("cum_before", F.col("cum_end") - F.col("cnt"))
    # conservative integer prefilter: a bucket whose LAST rank stays below
    # the 0.989 line cannot contain a pr >= 0.99 row (0.99 as a double is
    # fractionally below 99/100, so the margin absorbs the float rounding);
    # exact small-integer arithmetic, no float compare here
    kept = hist.filter(
        F.lit(1000) * F.col("cum_end") >= F.lit(989) * (F.col("n") - F.lit(1))
    )
    sliced = cd.withColumn("bucket", b).join(
        F.broadcast(kept.select("channel_id", "bucket", "cum_before", "n")),
        ["channel_id", "bucket"],
    )
    wb = Window.partitionBy("channel_id", "bucket").orderBy("value", "id")
    pr = F.when(
        F.col("n") > 1,
        (F.col("rk") - F.lit(1)).cast("double")
        / (F.col("n") - F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        sliced.withColumn("rk", F.col("cum_before") + F.row_number().over(wb))
        .withColumn("pr", pr)
        .filter(F.col("pr") >= 0.99)
        .select("id", "channel_id", "ts", "value", "pr")
    )


@register(
    "op_quality_constraints",
    f"""WITH {_D},
    fk AS (
      SELECT count(*) AS v FROM channel_data cd
      WHERE NOT EXISTS (SELECT 1 FROM channels ch WHERE ch.id = cd.channel_id)
    ),
    scan AS (
      SELECT
        sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS null_value,
        sum(CASE WHEN value < 0 OR value > 500 THEN 1 ELSE 0 END) AS range_value,
        sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
                   OR ts >= TIMESTAMP '2024-02-01 00:00:00'
                 THEN 1 ELSE 0 END) AS ts_bounds
      FROM channel_data
    ),
    dup AS (
      SELECT COALESCE(sum(c - 1), 0) AS v
      FROM (SELECT count(*) AS c FROM channel_data GROUP BY id) t
      WHERE c > 1
    )
    SELECT 'fk_channel' AS rule, CAST(v AS BIGINT) AS violations FROM fk
    UNION ALL SELECT 'null_value', CAST(null_value AS BIGINT) FROM scan
    UNION ALL SELECT 'range_value', CAST(range_value AS BIGINT) FROM scan
    UNION ALL SELECT 'ts_bounds', CAST(ts_bounds AS BIGINT) FROM scan
    UNION ALL SELECT 'dup_id', CAST(v AS BIGINT) FROM dup""",
    doc="data-quality constraint audit over the sink — the validation stage "
    "a production pipeline runs before admitting a batch: referential "
    "integrity (channel_id -> channels, broadcast anti-join), null check, "
    "value-range check, event-time bounds, and duplicate-key count, each "
    "reported as (rule, violations).  The three scan rules fold into ONE "
    "conditional aggregate over a single pass (no rule re-scans the "
    "table); the FK rule broadcasts the dimension; the dup rule is the "
    "only shuffle (groupBy id) and at 100 TB would ride the existing "
    "(channel, date) layout.  Constraint counts, not row dumps: the audit "
    "output stays tiny no matter the table size",
)
def op_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.sources.daq_dims import channels_df

    cd = _cd(spark, sf_dir)
    ch = channels_df(spark).select(F.col("id").alias("channel_id"))
    fk = (
        cd.join(F.broadcast(ch), "channel_id", "left_anti")
        .agg(F.count("*").cast("bigint").alias("violations"))
        .select(F.lit("fk_channel").alias("rule"), "violations")
    )
    lo = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hi = F.lit("2024-02-01 00:00:00").cast("timestamp")
    scan = cd.agg(
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_value"),
        F.sum(F.when((F.col("value") < 0) | (F.col("value") > 500), 1).otherwise(0))
        .cast("bigint")
        .alias("range_value"),
        F.sum(F.when((F.col("ts") < lo) | (F.col("ts") >= hi), 1).otherwise(0))
        .cast("bigint")
        .alias("ts_bounds"),
    )
    scan_rows = scan.selectExpr(
        "stack(3, 'null_value', null_value, 'range_value', range_value, "
        "'ts_bounds', ts_bounds) AS (rule, violations)"
    )
    dup = (
        cd.groupBy("id")
        .count()
        .filter(F.col("count") > 1)
        .agg(
            F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
            .cast("bigint")
            .alias("violations")
        )
        .select(F.lit("dup_id").alias("rule"), "violations")
    )
    return fk.unionByName(scan_rows).unionByName(dup)


@register(
    "op_join_scd2",
    f"""WITH {_D},
    dim AS (
      SELECT ch.id AS channel_id, v.v AS cfg_version,
             CASE v.v WHEN 1 THEN TIMESTAMP '1970-01-01 00:00:00'
                      WHEN 2 THEN TIMESTAMP '2024-01-11 00:00:00'
                      ELSE TIMESTAMP '2024-01-21 00:00:00' END AS valid_from,
             CASE v.v WHEN 1 THEN TIMESTAMP '2024-01-11 00:00:00'
                      WHEN 2 THEN TIMESTAMP '2024-01-21 00:00:00'
                      ELSE TIMESTAMP '2100-01-01 00:00:00' END AS valid_to
      FROM channels ch CROSS JOIN (SELECT unnest([1, 2, 3]) AS v) v
    )
    SELECT cd.id, cd.channel_id, cd.ts, cd.value,
           CAST(d.cfg_version AS INT) AS cfg_version
    FROM channel_data cd JOIN dim d
      ON cd.channel_id = d.channel_id
     AND cd.ts >= d.valid_from AND cd.ts < d.valid_to""",
    doc="SCD2 point-in-time dimension join — the warehouse pattern the "
    "as-of EVENT join doesn't cover: the channel CONFIG is versioned with "
    "validity intervals (three deterministic config epochs per channel), "
    "and every sample joins the version valid AT ITS event time.  Plan: "
    "the versioned dim is built by exploding a 3-element version array "
    "over the broadcast channels frame (no cross join), and the temporal "
    "join is a BroadcastHashJoin on the channel_id equi-key with the "
    "interval containment as a residual filter — never a nested-loop "
    "range join.  At 100 TB the dim stays broadcast-sized (config "
    "history, not data history) and the fact side never re-shuffles",
)
def op_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.sources.daq_dims import channels_df

    cd = _cd(spark, sf_dir)
    t = lambda x: F.lit(x).cast("timestamp")  # noqa: E731
    dim = (
        channels_df(spark)
        .select(F.col("id").alias("channel_id"))
        .withColumn("cfg_version", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))))
        .withColumn(
            "valid_from",
            F.when(F.col("cfg_version") == 1, t("1970-01-01 00:00:00"))
            .when(F.col("cfg_version") == 2, t("2024-01-11 00:00:00"))
            .otherwise(t("2024-01-21 00:00:00")),
        )
        .withColumn(
            "valid_to",
            F.when(F.col("cfg_version") == 1, t("2024-01-11 00:00:00"))
            .when(F.col("cfg_version") == 2, t("2024-01-21 00:00:00"))
            .otherwise(t("2100-01-01 00:00:00")),
        )
    )
    return (
        cd.join(
            F.broadcast(dim),
            (cd["channel_id"] == dim["channel_id"])
            & (cd["ts"] >= dim["valid_from"])
            & (cd["ts"] < dim["valid_to"]),
        )
        .select(
            cd["id"], cd["channel_id"], cd["ts"], cd["value"],
            F.col("cfg_version").cast("int").alias("cfg_version"),
        )
    )
