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


def _any_negative_zero(v) -> bool:
    """True if v (a cell, possibly a list/array/struct-dict) holds IEEE -0.0."""
    import math

    if isinstance(v, float):  # numpy float64 subclasses float
        return v == 0.0 and math.copysign(1.0, v) < 0
    if isinstance(v, dict):
        return any(_any_negative_zero(x) for x in v.values())
    if hasattr(v, "__iter__") and not isinstance(v, (str, bytes)):
        return any(_any_negative_zero(x) for x in v)
    return False


@pytest.mark.parametrize("name", sorted(plans.ORACLE))
def test_oracle_no_negative_zero(oracle_con, name):
    """Lint the -0.0 bug class out of every oracle (r07 VERDICT task 2).

    DuckDB's round() keeps the IEEE sign bit on a tiny-negative expression
    that rounds to zero; Spark's BigDecimal round never emits -0.0, so the
    driver's strict value-hash fails even though both answers are "zero".
    This slipped through twice (r03 vector_normalize, r07
    train_quality_logreg) because the pytest harness canonicalizes -0.0 ==
    0.0. The house rule (plans/__init__.py docstring) is to append "+ 0"
    to any rounded possibly-negative output; this test enforces it by
    running the oracle side alone and failing on any -0.0 result cell.
    """
    df = oracle_con.execute(plans.ORACLE[name]).df()
    bad = [
        col
        for col in df.columns
        if any(_any_negative_zero(v) for v in df[col])
    ]
    assert not bad, (
        f"{name}: oracle emits IEEE -0.0 in column(s) {bad}; append '+ 0' "
        "to the rounded expression (see plans/__init__.py docstring)"
    )


@pytest.mark.parametrize("name", sorted(set(plans.QUERIES) - set(plans.ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = plans.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_window_covers_all_unchecked():
    """Rotation invariant (CLAUDE.md): the driver runs only the FIRST 50
    of queries(), so every query with no green driver row under its
    current oracle (including FORCE_RECHECK re-entries) must sort inside
    that window — an unchecked query past the cut would never earn a
    correctness row. Fails loudly when a round registers more new queries
    than the window has slack."""
    import __spark_entry__ as m

    last_green = m._last_green_round()
    for name, since_round in m.FORCE_RECHECK.items():
        if last_green.get(name, 0) < since_round:
            last_green.pop(name, None)
    names = m._ordered_names()
    past_cut = [n for n in names[50:] if n not in last_green]
    # DEFER_TO_TAIL names are deliberately past the cut ONLY during their
    # registration round (r16 VERDICT task 1: the exemption must be
    # round-scoped, or the deadlock it caused hides forever). An entry
    # whose registration round's CORRECTNESS file has landed is released —
    # it must sort inside the window like any other unchecked name.
    max_round = m._max_correctness_round()
    past_cut = [
        n for n in past_cut if m.DEFER_TO_TAIL.get(n, 0) <= max_round
    ]
    assert not past_cut, (
        f"{len(past_cut)} unchecked queries past the 50-query driver "
        f"window: {past_cut}"
    )


def test_defer_to_tail_round_scoped_expiry(monkeypatch):
    """DEFER_TO_TAIL self-expiry contract (r16 VERDICT task 1): an entry
    registered in round N sorts AFTER the freshness tail only while
    max(CORRECTNESS rounds) < N; once the registration round's file lands
    the name re-enters the normal unchecked block INSIDE the window. The
    old green-row-based expiry was circular (past-the-cut names can never
    earn the releasing green row)."""
    import __spark_entry__ as m

    # Pick any registered name with a green history and strip its greens
    # so it counts as unchecked, then defer it under both clock states.
    last_green = m._last_green_round()
    name = next(
        n
        for n in m._ordered_names()
        if n in last_green and n not in m.CORE_WINDOW
    )
    real_last_green = m._last_green_round

    def no_green_for_name():
        d = real_last_green()
        d.pop(name, None)
        return d

    monkeypatch.setattr(m, "_last_green_round", no_green_for_name)
    max_round = m._max_correctness_round()

    # Still pending (registered in a future round): sorts into the
    # deferred tail, after every non-deferred name.
    monkeypatch.setitem(m.DEFER_TO_TAIL, name, max_round + 1)
    names = m._ordered_names()
    pending = [n for n in names if m.DEFER_TO_TAIL.get(n, 0) > max_round]
    assert name in pending
    assert names.index(name) >= len(names) - len(pending)

    # Registration round's file has landed: released into the unchecked
    # block, which sorts before every freshness re-pin — inside the window.
    monkeypatch.setitem(m.DEFER_TO_TAIL, name, max_round)
    names = m._ordered_names()
    assert names.index(name) < 50, (
        f"expired deferral for {name} must re-enter the driver window"
    )


def test_mixture_source_cardinality(spark, sf_dir):
    """sample_domain_mixture's residual weight splits over exactly
    _MIX_RESIDUAL_SHARDS = 20 - 2 unnamed shards; if the fixture's source
    cardinality ever drifts, the target mixture stops summing to 1 — fail
    loudly here instead (r05 ADVICE)."""
    from spark_streaming_kafka_example_spark.plans import textprep
    from spark_streaming_kafka_example_spark.sources import load_table

    n = load_table(spark, sf_dir, "documents").select("source").distinct().count()
    assert n == textprep._MIX_N_SOURCES
