"""Committed fixtures must match a fresh single-node regeneration.

If a kernel's semantics change without `python tools/make_fixtures.py`,
the driver's sf0.01 hash gate would fail; this catches the drift in the
suite instead. Values are compared (not parquet bytes — those vary across
pandas versions).
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location(
    "make_fixtures", os.path.join(REPO, "tools", "make_fixtures.py"))
mk = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mk)


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(mk.FIXTURES))
def test_fixture_matches_regeneration(name):
    import duckdb
    path = os.path.join(REPO, "fixtures", f"{name}.sf0_01.parquet")
    committed = pd.read_parquet(path)
    fresh = mk.FIXTURES[name](duckdb.connect(), SF)
    assert sorted(committed.columns) == sorted(fresh.columns)
    assert _canon(committed) == _canon(fresh), (
        f"fixture {name} is stale — rerun tools/make_fixtures.py")
