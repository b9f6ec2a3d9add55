from daq_3i_spark.plans.registry import QUERIES, QueryDef, register, spark_queries, oracle_map  # noqa: F401

# importing the op modules populates the registry
import daq_3i_spark.plans.reference_ops  # noqa: F401,E402
import daq_3i_spark.plans.extension_ops  # noqa: F401,E402
import daq_3i_spark.plans.sql_surface  # noqa: F401,E402
import daq_3i_spark.plans.streaming_ops  # noqa: F401,E402
