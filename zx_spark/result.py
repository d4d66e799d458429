"""Result shaper — rows → the reference's JSON result shape.

Reference result model (SURVEY §1.4): ``HashMap<GroupKey,
HashMap<"$$agg(col)", AggregatedTimeseries{data, window_starts,
window_ends}>>`` serialized to JSON (src/lib.rs:74-79, 191-194, 840-843).
GroupKey serializes as a JSON-string key (src/lib.rs:102-109).

This is driver-side post-processing on an already-aggregated (small) result —
the only place in the engine that collects.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from zx_spark.compiler import WINDOW_END, WINDOW_START, group_alias
from zx_spark.model import Query


def shape_result(df: DataFrame, q: Query) -> dict:
    """Pivot the compiled query result into the zx JSON shape.

    Keys are sorted-JSON group keys (deterministic, unlike the reference's
    map iteration order — SURVEY §7 "non-determinism").
    """
    keys = [(c, group_alias(c)) for c in q.group_by]
    out: dict[str, dict] = {}
    # Deterministic timeseries order without requiring a sorted plan: the
    # result is already aggregated (small), so sort the collected rows here
    # rather than paying a global Sort exchange in the distributed plan.
    rows = sorted(
        df.collect(),
        key=lambda r: tuple(str(r[a]) for _, a in keys)
        + ((r[WINDOW_START],) if WINDOW_START in df.columns else ()),
    )
    for row in rows:
        gk = json.dumps({c: row[a] for c, a in keys}, sort_keys=True)
        slot = out.setdefault(gk, {})
        for sel in q.selects:
            agg = slot.setdefault(
                sel.key, {"data": [], "window_starts": [], "window_ends": []}
            )
            agg["data"].append(row[sel.alias])
            agg["window_starts"].append(_num(row[WINDOW_START]))
            agg["window_ends"].append(_num(row[WINDOW_END]))
    return out


def shape_result_json(df: DataFrame, q: Query) -> str:
    return json.dumps(shape_result(df, q), sort_keys=True)


def _num(v: float) -> float | int:
    if v is not None and float(v).is_integer():
        return int(v)
    return v
