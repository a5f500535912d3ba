"""The UDF surface (SURVEY §2.10 U3, P13).

The reference registers one scalar UDF for SQL use:
``doubleString(str) = str + str`` (reference UdfRegister.scala:13). Both the
row-at-a-time parity version and the Arrow-vectorized pandas version are
provided; ``register_udfs`` exposes them to ``spark.sql``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T

__all__ = ["double_string", "double_string_pandas", "register_udfs"]


def double_string(s: str | None) -> str | None:
    return None if s is None else s + s


@F.pandas_udf(T.StringType())
def double_string_pandas(s: pd.Series) -> pd.Series:
    return s + s


def register_udfs(spark: SparkSession) -> None:
    """Register both variants for SQL (U1-U3): ``doubleString`` is the
    reference-parity name; ``doubleStringVec`` the vectorized twin to prefer
    in hot paths."""
    spark.udf.register("doubleString", double_string, T.StringType())
    spark.udf.register("doubleStringVec", double_string_pandas)
