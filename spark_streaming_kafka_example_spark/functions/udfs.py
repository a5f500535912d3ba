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

__all__ = ["double_string", "double_string_pandas", "register_udfs",
           "BigramsUDTF", "register_udtfs"]


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


@F.udtf(returnType="pos int, bigram string")
class BigramsUDTF:
    """Table-valued function: one row per word bigram with its position.

    No UDTF exists in the reference (SURVEY §2.10); this is the engine
    capability a text pipeline reaches for when one input row fans out to
    many derived rows with SQL-side LATERAL composition. Row-based Python
    execution — for hot paths prefer the equivalent built-in composition
    (split + transform + posexplode, see p12b/text n-gram queries); the
    UDTF earns its cost when the generator logic can't be expressed with
    built-ins.
    """

    def eval(self, text: str):
        words = (text or "").split(" ")
        for i in range(len(words) - 1):
            yield i, words[i] + " " + words[i + 1]


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("bigrams", BigramsUDTF)
