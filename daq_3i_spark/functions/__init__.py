from daq_3i_spark.functions.decode import (  # noqa: F401
    REG_COUNT,
    decode_col,
    decode_cols,
    decode_sql_duckdb,
    decode_numpy,
    decode_pandas_udf,
)
from daq_3i_spark.functions.convert import (  # noqa: F401
    compile_conversion,
    conversion_to_spark_sql,
    conversion_to_duckdb_sql,
    convert_fallback_udf,
)
