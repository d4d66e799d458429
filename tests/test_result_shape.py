"""Result shaper golden test — the reference JSON shape (SURVEY §1.4:
GroupKey-string keys → "$$agg(col)" → {data, window_starts, window_ends};
src/lib.rs:74-79, 191-194, 840-843). Matches the M1 flagship expectation
from SURVEY §7."""

from __future__ import annotations

import json

from zx_spark.compiler import compile_query
from zx_spark.model import Aggregate, Query, Select
from zx_spark.result import shape_result, shape_result_json
from zx_spark.storage import zx_fixture


def test_shape_matches_reference_flagship(spark):
    # sum(foo) group by y @ 15s granularity — the SURVEY §7 M1 golden
    # (expected values from reference test source, sum test).
    q = Query(
        selects=[Select("foo", Aggregate.SUM)],
        group_by=["y"],
        granularity_s=15,
        window_mode="faithful",
    )
    out = shape_result(compile_query(zx_fixture(spark), q), q)
    assert out[json.dumps({"y": "9"})] == {
        "$$sum(foo)": {"data": [1400.0], "window_starts": [3], "window_ends": [9]}
    }
    assert out[json.dumps({"y": "1"})]["$$sum(foo)"]["data"] == [100.0]
    assert out[json.dumps({"y": "__nil"})]["$$sum(foo)"] == {
        "data": [4000.0],
        "window_starts": [1],
        "window_ends": [8],
    }


def test_shape_json_deterministic(spark):
    q = Query(
        selects=[Select("foo", Aggregate.MEAN)],
        group_by=["y"],
        granularity_s=15,
    )
    a = shape_result_json(compile_query(zx_fixture(spark), q), q)
    b = shape_result_json(compile_query(zx_fixture(spark), q), q)
    assert a == b
    assert "571.4285714285714" in a
