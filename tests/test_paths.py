"""Event path analysis: hand journeys with known paths, a pure-Python
reference over the driver events, DuckDB value parity for the top-k
paths, next-step distribution identities, and plan shape (one user
shuffle + one path aggregation)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pytest

from zx_spark.operators.paths import (
    common_paths,
    next_step_distribution,
    user_step_sequences,
)

SF = "/root/testdata/sf0.01"

EVENTS = [
    # (event_id, user_id, ts, step)
    (1, 1, 1.0, "a"), (2, 1, 2.0, "b"), (3, 1, 3.0, "c"), (4, 1, 4.0, "b"),
    (5, 2, 1.0, "a"), (6, 2, 2.0, "b"), (7, 2, 3.0, "c"),
    (8, 3, 5.0, "x"), (9, 3, 5.0, "y"),  # tie: id order decides x before y
    (10, None, 1.0, "a"), (11, 4, None, "a"), (12, 4, 2.0, None),
]


@pytest.fixture()
def ev(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, user_id long, ts double, event_type string"
    )


def test_sequences_order_and_null_handling(spark, ev):
    seqs = {
        r["user_id"]: r["steps"]
        for r in user_step_sequences(ev, id_col="event_id").collect()
    }
    assert seqs == {1: ["a", "b", "c", "b"], 2: ["a", "b", "c"], 3: ["x", "y"]}
    capped = {
        r["user_id"]: r["steps"]
        for r in user_step_sequences(ev, id_col="event_id", max_len=2).collect()
    }
    assert capped[1] == ["a", "b"]


def test_common_paths_counts_and_ties(spark, ev):
    rows = [
        (r["path"], r["n_occurrences"], r["n_users"])
        for r in common_paths(ev, n=2, k=10, id_col="event_id").collect()
    ]
    assert rows[0] == ("a>b", 2, 2)  # ties: 'a>b' before 'b>c' (count tie? no: both 2)
    d = dict((p, (o, u)) for p, o, u in rows)
    assert d["b>c"] == (2, 2)
    assert d["c>b"] == (1, 1)
    assert d["x>y"] == (1, 1)
    # deterministic global order: count desc, path asc
    assert rows == sorted(rows, key=lambda t: (-t[1], t[0]))
    # unique_per_user collapses repeats
    uniq = {
        r["path"]: r["n_occurrences"]
        for r in common_paths(
            ev, n=1, k=10, id_col="event_id", unique_per_user=True
        ).collect()
    }
    assert uniq["b"] == 2  # user 1 has two 'b' steps but counts once


def test_next_step_distribution(spark, ev):
    rows = {
        r["next_step"]: (r["n"], r["frac"])
        for r in next_step_distribution(ev, "b", id_col="event_id").collect()
    }
    # transitions out of 'b': b>c twice (users 1 and 2); user 1's final
    # 'b' ends the sequence and contributes nothing
    assert rows == {"c": (2, 1.0)}


def test_validation(spark, ev):
    with pytest.raises(ValueError):
        common_paths(ev, n=0)
    with pytest.raises(ValueError):
        common_paths(ev, k=0)
    with pytest.raises(ValueError):
        user_step_sequences(ev, max_len=0)


def _py_paths(rows, n):
    by_user = defaultdict(list)
    for eid, u, t, s in rows:
        if u is None or t is None or s is None:
            continue
        by_user[u].append((t, eid, s))
    occ, users = Counter(), defaultdict(set)
    for u, evs in by_user.items():
        steps = [s for _, _, s in sorted(evs)]
        for i in range(len(steps) - n + 1):
            p = ">".join(steps[i : i + n])
            occ[p] += 1
            users[p].add(u)
    return occ, users


def test_driver_events_python_and_duckdb_parity(spark):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events")
    got = [
        (r["path"], r["n_occurrences"], r["n_users"])
        for r in common_paths(ev, n=3, k=15, id_col="event_id").collect()
    ]
    # Python reference over the same parquet
    raw = duckdb.connect().execute(
        f"SELECT event_id, user_id, epoch(ts), event_type "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    occ, users = _py_paths(raw, 3)
    want = sorted(
        ((p, c, len(users[p])) for p, c in occ.items()),
        key=lambda t: (-t[1], t[0]),
    )[:15]
    assert got == want
    # independent DuckDB formulation
    duck = duckdb.connect().execute(f"""
        WITH e AS (
          SELECT user_id, event_type, epoch(ts) AS t, event_id
          FROM '{SF}/events.parquet'
          WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
        ),
        seq AS (
          SELECT user_id, list(event_type ORDER BY t, event_id, event_type) AS steps
          FROM e GROUP BY user_id
        ),
        grams AS (
          SELECT user_id, array_to_string(steps[i:i+2], '>') AS path
          FROM seq, unnest(generate_series(1, greatest(len(steps) - 2, 0))) AS u(i)
        )
        SELECT path, count(*) AS n_occurrences, count(DISTINCT user_id) AS n_users
        FROM grams GROUP BY path ORDER BY n_occurrences DESC, path ASC LIMIT 15
    """).fetchall()
    assert got == [(p, int(o), int(u)) for p, o, u in duck]


def test_plan_shape(spark):
    from zx_spark.storage import read_table

    ev = read_table(spark, SF, "events")
    plan = (
        common_paths(ev, n=3, k=10, id_col="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan parquet") == 1  # one scan, one user shuffle
