"""Regression fence for the float-output policy (the events_sessionize
bug class, red in rounds 1-2): an exact-decimal-derived value (integer
micros scaled by 1e6) must NEVER pass through a final round(double, n)
— Spark rounds the shortest-decimal repr via BigDecimal HALF_UP while
DuckDB multiplies and rounds in binary, and they disagree exactly on
the .xxx5-boundary values such columns sit on by construction. The
exact sums must exit via a single IEEE division instead."""

from __future__ import annotations

import inspect
import re

import __spark_entry__ as entrymod


def test_no_round_over_exact_micros_in_oracles():
    banned = re.compile(
        r"round\s*\(\s*sum\s*\(\s*CAST\s*\(\s*round", re.IGNORECASE)
    offenders = [name for name, sql in entrymod.oracle_sql().items()
                 if banned.search(sql)]
    assert not offenders, (
        f"oracle(s) {offenders} round an exact-micros sum — emit "
        f"sum_micros/1e6 unrounded (see _exact_sum docstring)")


def test_exact_sum_emits_unrounded_division():
    src = inspect.getsource(entrymod._exact_sum)
    assert "F.round(F.sum" not in src, (
        "_exact_sum regained a final decimal round — that reintroduces "
        "the Spark-BigDecimal vs DuckDB-binary rounding divergence")


def test_running_sum_oracle_uses_micros_window():
    sql = entrymod.oracle_sql()["events_running_sum"]
    assert "CAST(round(value * 1000000) AS BIGINT)" in sql
    assert not re.search(r"round\s*\(\s*sum\s*\(\s*value\s*\)", sql)
