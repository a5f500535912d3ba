"""General analytics capability matrix over the TPC-H-ish tables.

The reference exercises only one join type and sum/count aggregation
(SURVEY §2.5-§2.8); these queries cover the join family, sorts/limits, set
ops, distinct/rollup/cube/pivot, and window functions that any user of a
Spark-based engine reaches for next. All are pure DataFrame API -> Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import load_table
from . import register

# placeholder — populated in Phase 1
