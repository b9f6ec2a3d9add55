"""Structured Streaming realization of the reference daemon (SURVEY.md §3).

The reference's thread graph (acquire -> persist -> pulse -> truncate,
/root/reference/daq-3i.py:308-348) maps to ONE streaming query:

    source (file replay / Modbus DataSource)
      -> stream-static broadcast join with the channels dim
      -> decode + conversion column expressions
      -> foreachBatch: append channel_data + MERGE daq_status + retention

Thread boundaries become micro-batch boundaries; the ``is_dirty`` handoff
becomes checkpointing (exactly-once per sink write vs the reference's
at-most-once in-memory slot); the 1 Hz tick becomes the trigger.
"""

from daq_3i_spark.streaming.pipeline import (  # noqa: F401
    build_sample_stream,
    run_pipeline,
)
from daq_3i_spark.streaming.stateful import latest_per_key_stream  # noqa: F401
from daq_3i_spark.streaming.windows import session_aggs, windowed_aggs  # noqa: F401
