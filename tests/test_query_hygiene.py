"""Fence for the config-leak bug class (round-4 review finding #2):
building ANY `queries()` entry must not mutate the driver-supplied
SparkSession — the grading driver runs all 50 window entries through
ONE session, so a conf/timezone leak from entry k silently changes the
environment for entries k+1..50.

Plan-build only (no collect): the heavyweight end-to-end entries that
RUN jobs at build time (CDC replay/changelog) are exercised elsewhere
and excluded here to keep the sweep fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# entries that execute jobs (and create/remove temp lake dirs) at
# plan-build time — covered by tests/test_cdc.py and the driver itself
HEAVY = {"cdc_replay_lake", "cdc_changelog"}

WATCHED = [
    "spark.sql.session.timeZone",
    "spark.sql.shuffle.partitions",
    "spark.sql.ansi.enabled",
    "spark.sql.adaptive.enabled",
]


@pytest.mark.parametrize(
    "name", [n for n in entrymod.queries() if n not in HEAVY])
def test_query_build_leaves_session_config_untouched(spark, name):
    before = {k: spark.conf.get(k, None) for k in WATCHED}
    df = entrymod.queries()[name](spark, SF)
    assert df is not None and df.columns  # plan actually built
    after = {k: spark.conf.get(k, None) for k in WATCHED}
    assert after == before, (
        f"building query {name!r} changed session config: "
        f"{ {k: (before[k], after[k]) for k in WATCHED if before[k] != after[k]} }")
