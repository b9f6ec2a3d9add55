from daq_3i_spark.operators.core import (  # noqa: F401
    latest_per_key,
    oldest_n_per_key,
    retention_keep,
    status_snapshot,
)
