"""Structured Streaming layer (SURVEY §2.1-§2.2, §2.7, §2.9).

The reference's nine programs collapse into: sources (sources/), the shared
transform/analytics core (same functions as batch — Structured Streaming's
point), sinks (streaming/sinks.py), pipeline wiring (streaming/pipelines.py)
and arbitrary-state ops (streaming/stateful.py). Tests drive everything with
bounded file sources + availableNow triggers for determinism (SURVEY §5).
"""
