"""LLM-data-pipeline operators (SURVEY §7 Phase 3): dedup, similarity
search, text analysis, multimodal plumbing — over documents/embeddings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from . import register

# placeholder — populated in Phase 3
