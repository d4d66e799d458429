"""Plan and skew diagnostics — the operability half of "would this
survive 100×": read WHAT THE OPTIMIZER ACTUALLY PLANNED (pushed
filters, pruned schema, exchanges, codegen coverage, join strategies)
and WHAT THE KEYS ACTUALLY LOOK LIKE (skew factors) instead of
guessing.

``plan_report`` is the programmatic form of the assertions
tests/test_plan_quality.py makes ad hoc — exposed so pipelines can
gate on plan shape in CI ("this query must broadcast", "no cartesian
ever") the same way they gate on results. ``broadcast_audit`` /
``assert_bounded_broadcasts`` (r13) add the broadcast-bound gate:
every BroadcastExchange input classified bounded / tracked / untrusted
by a structural walk of the plan tree — the estimate-small-but-
data-sized build sides that OOM only at scale fail in CI instead."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_report(df: DataFrame) -> dict:
    """Summarize the EXECUTED plan: counts of exchanges / sorts /
    python evals, join strategies used, pushed parquet filters, read
    schemas, and whole-stage-codegen span count. Pure string analysis
    of the physical plan — no job runs. NOTE: under AQE the codegen
    span count is only populated AFTER the query has executed at least
    once (the pre-execution adaptive plan hides codegen stages); the
    other fields are accurate either way."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    simple = df._jdf.queryExecution().simpleString()

    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: ([^\n]+)", plan)
    joins = sorted(
        set(
            m
            for m in re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        )
    )
    return {
        # standalone Exchange nodes of ANY partitioning (hash, range,
        # round-robin, single) — \bExchange\b cannot match inside
        # BroadcastExchange/ReusedExchange (no word boundary there)
        "n_exchanges": count(r"\bExchange\b"),
        "n_broadcast_exchanges": count(r"BroadcastExchange"),
        "n_sorts": count(r"\bSort \["),
        "n_python": count(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"),
        # AQE's executedPlan string hides WholeStageCodegen nodes until
        # execution; the *(n) markers in the simple string are the
        # codegen stage ids either way
        "n_codegen_spans": max(
            count(r"WholeStageCodegen"),
            len(set(re.findall(r"\*\((\d+)\)", simple))),
        ),
        "joins": joins,
        "has_cartesian": "CartesianProduct" in plan
        or "BroadcastNestedLoopJoin" in plan,
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": [s.strip() for s in schemas],
        "plan": simple,
    }


def assert_scaling_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    no_cartesian: bool = True,
    no_python: bool = False,
    require_pushed_filter: str | None = None,
) -> dict:
    """Gate a query on plan shape (raises AssertionError with the plan
    attached). Returns the report for logging."""
    r = plan_report(df)
    if no_cartesian and r["has_cartesian"]:
        raise AssertionError(f"plan contains a cartesian/BNL join:\n{r['plan']}")
    if max_exchanges is not None and r["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {r['n_exchanges']} exchanges (max {max_exchanges}):\n{r['plan']}"
        )
    if no_python and r["n_python"] > 0:
        raise AssertionError(f"plan evaluates Python:\n{r['plan']}")
    if require_pushed_filter is not None and not any(
        require_pushed_filter in p for p in r["pushed_filters"]
    ):
        raise AssertionError(
            f"no pushed filter matching {require_pushed_filter!r} "
            f"(pushed: {r['pushed_filters']}):\n{r['plan']}"
        )
    return r


# ------------------------------------------------------------- broadcast audit
#
# The r12 lesson (SCALE.md: source_overlap_matrix): a join build side that
# is DATA-SIZED (∝ corpus) but ESTIMATE-SMALL gets planned as a broadcast,
# and the failure only surfaces under heap pressure at scale — "a broadcast
# an operator did not explicitly bound is a latent OOM whose trigger is
# heap pressure elsewhere". These helpers turn that audit into a gate: walk
# the physical plan STRUCTURALLY (py4j over the SparkPlan tree — no string
# parsing), classify every BroadcastExchange input, and fail on the
# untrusted class.
#
# Trust model (why a plain fact-table scan under a broadcast PASSES):
# Catalyst's size estimate for a scan(+filter/project) chain TRACKS the
# data — at 100× the bytes the same query re-plans to a sort-merge join by
# itself, so an sf0.01 broadcast of a scanned table is a size-accurate,
# self-correcting decision. What does NOT self-correct is a grouped
# aggregate / distinct / fact⋈fact join output: its estimate is a guess
# that stays under the 64 MB threshold while the true size grows with the
# corpus (the r12 failure). Hence three levels:
#
#   BOUNDED  — provably small at any corpus size: local/literal frames
#              (collected models, stat rows), LIMIT/TakeOrdered, global
#              aggregates (one row), grouped aggregates whose every key is
#              in the caller's ``bounded_keys`` domain declaration.
#   TRACKED  — scan chains (and their joins against BOUNDED frames): the
#              estimate is real file bytes; trusts Spark to flip the join
#              strategy at scale. ``dim_tables`` promotes named tables to
#              BOUNDED (region/nation-class).
#   UNTRUSTED— a grouped aggregate with unbounded keys over data, a join
#              of two TRACKED (data-sized) sides, or an opaque leaf the
#              walker cannot see through. FAILS the assert.

_BOUNDED, _TRACKED, _UNTRUSTED = 0, 1, 2
_LIMIT_NODES = {
    "GlobalLimitExec",
    "LocalLimitExec",
    "TakeOrderedAndProjectExec",
    "CollectLimitExec",
}
_AGG_NODES = {"HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec"}
_SCAN_NODES = {"FileSourceScanExec", "BatchScanExec", "RowDataSourceScanExec"}
_LOCAL_NODES = {
    "LocalTableScanExec",
    "RDDScanExec",
    "RangeExec",
    "EmptyRelationExec",
    "OneRowRelationExec",
}
_JOIN_NODES = {
    "BroadcastHashJoinExec",
    "SortMergeJoinExec",
    "ShuffledHashJoinExec",
    "BroadcastNestedLoopJoinExec",
    "CartesianProductExec",
}


def _jname(node) -> str:
    return node.getClass().getSimpleName()


def _jchildren(node) -> list:
    """Structural children of a JVM SparkPlan node, descending through
    the wrappers that hide their subtree from ``children()``: the AQE
    root (``initialPlan`` — the pre-runtime plan, where BroadcastExchange
    nodes live), cached relations (``cachedPlan``), reused exchanges and
    query stages (``child``/``plan``)."""
    name = _jname(node)
    if name == "AdaptiveSparkPlanExec":
        return [node.initialPlan()]
    if name == "InMemoryTableScanExec":
        try:
            return [node.relation().cachedPlan()]
        except Exception:
            return []
    kids: list = []
    try:
        cs = node.children()
        kids = [cs.apply(i) for i in range(cs.size())]
    except Exception:
        pass
    if not kids:
        for m in ("child", "plan"):
            try:
                kids = [getattr(node, m)()]
                break
            except Exception:
                continue
    return kids


def _scan_table(node) -> str:
    try:
        rp = node.relation().location().rootPaths()
        base = rp.apply(0).toString().rstrip("/").rsplit("/", 1)[-1]
        return base[:-8] if base.endswith(".parquet") else base
    except Exception:
        return "<unknown>"


def _scan_is_catalog_backed(node) -> bool:
    """True when the scan reads a CATALOG table — the stats-backed frames
    ``register_views(with_stats=True)`` creates and ANALYZEs. CBO join
    estimates over these are ndv/rowCount-based and refresh per store
    version (each SF dir re-ANALYZEs on registration), so a broadcast
    CBO picked from them self-corrects at scale the same way a raw
    file-size decision does."""
    try:
        return bool(node.tableIdentifier().isDefined())
    except Exception:
        return False


def _grouping_names(node) -> list[str]:
    out = []
    ge = node.groupingExpressions()
    for i in range(ge.size()):
        e = ge.apply(i)
        try:
            out.append(str(e.name()))
        except Exception:
            out.append(e.toString())
    return out


def _classify(node, bounded_keys: frozenset, dim_tables: frozenset):
    """(level, reason) for one broadcast-input subtree — max severity
    propagates through pass-through nodes; see the trust model above."""
    name = _jname(node)
    if name in _LIMIT_NODES:
        return _BOUNDED, "limit"
    if name in _LOCAL_NODES:
        return _BOUNDED, "local"
    if name in _SCAN_NODES:
        t = _scan_table(node)
        if t in dim_tables:
            return _BOUNDED, f"dim-scan {t}"
        if _scan_is_catalog_backed(node):
            return _TRACKED, f"analyzed-scan {t}"
        return _TRACKED, f"scan {t}"
    if name in _AGG_NODES:
        keys = _grouping_names(node)
        if not keys:
            return _BOUNDED, "global-agg"
        if set(keys) <= bounded_keys:
            return _BOUNDED, f"bounded-keys {keys}"
        subs = [_classify(c, bounded_keys, dim_tables) for c in _jchildren(node)]
        if all(lv == _BOUNDED for lv, _ in subs):
            return _BOUNDED, f"agg over bounded input (keys={keys})"
        worst = max(subs, key=lambda s: s[0], default=(_TRACKED, "?"))
        return _UNTRUSTED, f"agg keys={keys} over data ({worst[1]})"
    kids = _jchildren(node)
    if not kids:
        return _UNTRUSTED, f"opaque leaf {name}"
    subs = [_classify(c, bounded_keys, dim_tables) for c in kids]
    if name in _JOIN_NODES:
        lvs = [lv for lv, _ in subs]
        if all(lv == _BOUNDED for lv in lvs):
            return _BOUNDED, "join of bounded inputs"
        if lvs.count(_TRACKED) >= 2:
            # fact ⋈ fact: a SIZE-ONLY output estimate no longer tracks
            # either scan — UNLESS every scan below is an ANALYZEd
            # catalog table, where CBO's ndv/rowCount join estimate
            # re-derives per store version (the r12 CBO passthrough:
            # its broadcast choices flip with the stats at each SF)
            if all("analyzed-scan" in r or lv == _BOUNDED for lv, r in subs):
                return _TRACKED, "cbo join of analyzed-scans"
            return _UNTRUSTED, "join of two data-sized sides"
        worst = max(subs, key=lambda s: s[0])
        return worst
    return max(subs, key=lambda s: s[0])


def _author_hinted(join_node, branch_idx: int) -> bool:
    """True when the enclosing physical join of a BroadcastExchange
    traces back (``logicalLink``) to a logical Join whose hint REQUESTED
    a broadcast — i.e. the author wrote ``F.broadcast(...)``/
    ``.hint("broadcast")``. SCALE.md's audit lesson distinguishes exactly
    this: "a broadcast an operator did NOT explicitly bound is a latent
    OOM" — an explicit hint is the operator bounding it, with the
    contract in its docstring (e.g. contaminated_docs' benchmark set).

    ``join_node`` is the nearest JOIN ancestor (the audit's traversal
    carries it through wrapper nodes — WholeStageCodegen/InputAdapter/
    ReusedExchange — so a disabled-AQE plan attributes hints the same
    way, ADVICE r13). The descended branch is checked first; because a
    logical↔physical side swap or a missing per-side link can make the
    branch mapping ambiguous, a broadcast hint on the OTHER side of the
    same join also counts: a BroadcastHashJoin builds exactly one side,
    and when its logical Join carries any broadcast hint, that hint is
    what committed the build (Catalyst honors the hinted side whenever
    it is buildable)."""
    if join_node is None:
        return False
    try:
        ll = join_node.logicalLink()
        if not ll.isDefined():
            return False
        lg = ll.get()
        if _jname(lg) != "Join":
            return False
        h = str(lg.hint().toString())
        side = "leftHint" if branch_idx == 0 else "rightHint"
        if f"{side}=(strategy=broadcast" in h:
            return True
        return "strategy=broadcast" in h
    except Exception:
        return False


def broadcast_audit(
    df: DataFrame,
    bounded_keys=(),
    dim_tables=(),
) -> list[dict]:
    """Classify EVERY BroadcastExchange input in ``df``'s physical plan
    (pre-runtime AQE plan — the strategy Catalyst committed to from its
    estimates). Returns one entry per exchange:
    ``{"level": "bounded"|"tracked"|"untrusted", "reason": str,
    "hinted": bool}`` — ``hinted`` marks an author-requested broadcast
    (explicit ``F.broadcast``/``hint("broadcast")``).

    ``bounded_keys``: column names whose value domain the CALLER attests
    is bounded at any corpus size (e.g. a source/lang/event-type enum) —
    a grouped aggregate keyed only by these is BOUNDED. ``dim_tables``:
    table basenames (parquet dir name without extension) attested
    dimension-small. Both are explicit, reviewable claims — the audit's
    job is to force them to be written down."""
    root = df._jdf.queryExecution().executedPlan()
    bk, dt = frozenset(bounded_keys), frozenset(dim_tables)
    names = {_BOUNDED: "bounded", _TRACKED: "tracked", _UNTRUSTED: "untrusted"}
    found: list[dict] = []
    # traversal carries the nearest JOIN ancestor + which branch of it we
    # descended, not the immediate parent: wrapper nodes (WholeStage
    # Codegen/InputAdapter/ReusedExchange, present with AQE disabled)
    # between join and exchange must not break hint attribution
    stack = [(root, None, 0)]
    while stack:
        n, join, branch = stack.pop()
        if _jname(n) == "BroadcastExchangeExec":
            for c in _jchildren(n):
                lv, reason = _classify(c, bk, dt)
                found.append(
                    {
                        "level": names[lv],
                        "reason": reason,
                        "hinted": _author_hinted(join, branch),
                    }
                )
        is_join = _jname(n) in _JOIN_NODES
        for i, c in enumerate(_jchildren(n)):
            stack.append((c, n, i) if is_join else (c, join, branch))
    return found


def assert_bounded_broadcasts(
    df: DataFrame,
    bounded_keys=(),
    dim_tables=(),
    fail_hinted: bool = False,
) -> list[dict]:
    """Gate a plan on the broadcast audit: raises AssertionError (plan
    attached) when any BroadcastExchange input classifies UNTRUSTED —
    the data-sized-but-estimate-small class that OOM'd source_overlap_
    matrix at sf10 (SCALE.md r12). Author-hinted broadcasts (explicit
    ``F.broadcast``) pass by default — the hint is the operator bounding
    the frame, per its own documented contract; ``fail_hinted=True``
    audits those too. Returns the full report for logging."""
    rep = broadcast_audit(df, bounded_keys=bounded_keys, dim_tables=dim_tables)
    bad = [
        e
        for e in rep
        if e["level"] == "untrusted" and (fail_hinted or not e["hinted"])
    ]
    if bad:
        raise AssertionError(
            "data-sized broadcast(s) in plan: "
            + "; ".join(e["reason"] for e in bad)
            + "\n"
            + df._jdf.queryExecution().simpleString()
        )
    return rep


def key_skew_report(
    df: DataFrame, key_cols: list[str] | str, top_k: int = 10
) -> dict:
    """Pre-join skew diagnosis for a key: top-``k`` hottest key values,
    and the skew factor ``max_count / avg_count`` — the number that
    says whether a shuffle on this key funnels into one task. One
    aggregation over the keys (map-side partial).

    Rule of thumb the report encodes: factor < 10 shuffles fine, 10-100
    relies on AQE skew splitting, > 100 wants salting
    (operators.joins.salted_join) or a broadcast of the other side."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.avg("__n").alias("avg"),
        F.max("__n").alias("mx"),
    ).collect()[0]
    if stats["n_keys"] == 0:
        return {"n_keys": 0, "skew_factor": 0.0, "top": []}
    top = [
        {"key": tuple(r[k] for k in keys), "count": r["__n"]}
        for r in counts.orderBy(F.col("__n").desc(), *keys).limit(top_k).collect()
    ]
    factor = float(stats["mx"]) / float(stats["avg"])
    return {
        "n_keys": stats["n_keys"],
        "avg_count": float(stats["avg"]),
        "max_count": int(stats["mx"]),
        "skew_factor": round(factor, 2),
        "recommendation": (
            "ok" if factor < 10 else "aqe" if factor < 100 else "salt_or_broadcast"
        ),
        "top": top,
    }
