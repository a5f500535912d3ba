"""Custom operators Spark lacks as single built-ins, each expressed
Spark-first (SURVEY §7 Phase 3 + pyspark_guide "Common OLAP patterns"):
compositions of DataFrame ops where semantics allow, pandas-UDF plumbing
only where they don't (multimodal decode)."""
