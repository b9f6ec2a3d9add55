from daq_3i_spark.sources.tables import load_table, register_views  # noqa: F401
from daq_3i_spark.sources.daq_dims import (  # noqa: F401
    buses_df,
    channels_df,
    conversions_df,
    channel_data_df,
    dims_cte_sql,
)
