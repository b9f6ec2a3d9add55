"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship acquisition pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry
(daq_3i_spark/plans/) keyed by SURVEY.md §2 op ids.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from daq_3i_spark.plans import QUERIES, oracle_map, spark_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_pipeline"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    return oracle_map()
