"""Column-expression builders and the UDF surface.

Everything in text.py / vectors.py is built from JVM-side
``pyspark.sql.functions`` (codegen'd, no Python in the hot path); udfs.py
holds the deliberate exceptions (the reference's scalar-UDF parity and the
Arrow-vectorized pandas variants).
"""

from . import text, udfs, vectors  # noqa: F401
