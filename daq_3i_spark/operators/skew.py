"""Skew-mitigation utilities: salted joins for hot keys.

At 100 TB the fact table's key distribution is rarely uniform (the FIXTURES
channel_data generator is deliberately zipf-skewed).  AQE's skew-join
splitting (on in session.py) handles sort-merge skew at runtime; *salting* is
the explicit form for when one side is a medium dimension — too big to
broadcast, joined on a skewed key:

    fact:  salt = id % n_salt           (deterministic, uniform)
    dim:   exploded n_salt times, one copy per salt value
    join:  on (key, salt)  ->  each hot key's rows spread over n_salt tasks

The join RESULT is identical to the unsalted join (salt never changes
matching), so the DuckDB oracle is simply the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: Column,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``key`` with an ``n_salt``-way salt.

    ``salt_src`` must be a deterministic fact-side column expression with
    high cardinality (e.g. the row id); the salt is ``salt_src % n_salt``.
    """
    f = fact.withColumn("__salt", (salt_src % n_salt).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")
