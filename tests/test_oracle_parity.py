"""Run every registered query against its DuckDB oracle at sf0.001 —
the local twin of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from spark_streaming_kafka_example_spark import plans

from .oracle_harness import compare, duckdb_connection

plans.load_all()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(plans.ORACLE))
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    df = plans.QUERIES[name](spark, sf_dir)
    compare(df, oracle_con, plans.ORACLE[name], name=name)


@pytest.mark.parametrize("name", sorted(set(plans.QUERIES) - set(plans.ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = plans.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_mixture_source_cardinality(spark, sf_dir):
    """sample_domain_mixture's residual weight splits over exactly
    _MIX_RESIDUAL_SHARDS = 20 - 2 unnamed shards; if the fixture's source
    cardinality ever drifts, the target mixture stops summing to 1 — fail
    loudly here instead (r05 ADVICE)."""
    from spark_streaming_kafka_example_spark.plans import textprep
    from spark_streaming_kafka_example_spark.sources import load_table

    n = load_table(spark, sf_dir, "documents").select("source").distinct().count()
    assert n == textprep._MIX_N_SOURCES
