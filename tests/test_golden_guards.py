"""Non-finite float guards on BOTH sides of the golden-VALUES pipeline
(VERDICT r4 ask #4): the SQL renderer emits valid typed CASTs instead of
bare nan/inf tokens, and the generator refuses to write a golden
containing them at all (a non-finite statistic means the oracle
computation itself went wrong)."""

from __future__ import annotations

import math

import pytest

from tilers_tools_spark.plans.golden_sql import _lit


def test_lit_renders_nonfinite_as_typed_casts():
    assert _lit(float("nan"), "float64") == "CAST('nan' AS DOUBLE)"
    assert _lit(float("inf"), "float64") == "CAST('infinity' AS DOUBLE)"
    assert _lit(float("-inf"), "float64") == "CAST('-infinity' AS DOUBLE)"
    assert _lit(None, "float64") == "NULL"
    assert _lit(1.5, "float64") == "1.5"


def test_lit_nonfinite_casts_are_valid_duckdb():
    import duckdb

    sql = ", ".join(
        _lit(v, "float64") for v in [float("nan"), float("inf"), float("-inf"), 2.25]
    )
    row = duckdb.sql(f"SELECT {sql}").fetchone()
    assert math.isnan(row[0]) and row[1] == float("inf") and row[2] == float("-inf")
    assert row[3] == 2.25


def test_make_golden_save_refuses_nonfinite(tmp_path, monkeypatch):
    import importlib.util
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_golden_sql", os.path.join(repo, "tools", "make_golden_sql.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["make_golden_sql"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "OUT", str(tmp_path))
    with pytest.raises(ValueError, match="non-finite"):
        mod.save("probe", ["a", "b"], ["int64", "float64"], [[1, 0.5], [2, float("nan")]])
    assert not (tmp_path / "probe.json").exists()
    # finite rows still write
    mod.save("probe", ["a", "b"], ["int64", "float64"], [[1, 0.5]])
    assert (tmp_path / "probe.json").exists()
