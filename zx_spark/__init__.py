"""zx_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of humble-tools/zx (reference: /root/reference,
a Redis-module columnar event store, src/lib.rs).

Design stance (SURVEY.md): the reference's capabilities — time-range-scanned,
sparse, sample-rate-weighted, time-windowed grouped aggregation over columnar
storage — are expressed here as declarative DataFrame plans so Catalyst/
Tungsten pick the physical strategy. Nothing in this package hand-schedules
what the optimizer already does: time-range scans become Parquet
partition/stat pruning, column fetch becomes column pruning, per-condition
filtering becomes pushed-down predicates.
"""

from zx_spark.model import Aggregate, Cmp, Condition, Query, Select
from zx_spark.compiler import compile_query, run_query, run_sorted
from zx_spark.session import get_spark


# Lazy top-level exports: attribute name -> (module, attr). Keeps
# `import zx_spark` light while the common verbs stay one import away.
_LAZY = {
    "curate_corpus": ("zx_spark.pipeline", "curate_corpus"),
    "curation_audit": ("zx_spark.pipeline", "curation_audit"),
    "profile_table": ("zx_spark.operators.profile", "profile_table"),
    "diff_snapshots": ("zx_spark.operators.diffs", "diff_snapshots"),
    "diff_summary": ("zx_spark.operators.diffs", "diff_summary"),
    "plan_report": ("zx_spark.plan", "plan_report"),
    "assert_scaling_plan": ("zx_spark.plan", "assert_scaling_plan"),
    "key_skew_report": ("zx_spark.plan", "key_skew_report"),
    # r13 additions: the broadcast-bound gate + stats lifecycle
    "broadcast_audit": ("zx_spark.plan", "broadcast_audit"),
    "assert_bounded_broadcasts": ("zx_spark.plan", "assert_bounded_broadcasts"),
    "invalidate_stats": ("zx_spark.storage", "invalidate_stats"),
    "register_views": ("zx_spark.storage", "register_views"),
    "write_training_shards": ("zx_spark.export", "write_training_shards"),
    "read_training_shards": ("zx_spark.export", "read_training_shards"),
    # r6 additions
    "bm25_search": ("zx_spark.operators.search", "bm25_search"),
    "keyword_search": ("zx_spark.operators.search", "keyword_search"),
    "duplicated_spans": ("zx_spark.operators.spans", "duplicated_spans"),
    "duplicated_span_stats": ("zx_spark.operators.spans", "duplicated_span_stats"),
    "strip_duplicated_spans": ("zx_spark.operators.spans", "strip_duplicated_spans"),
    "roc_auc": ("zx_spark.operators.evaluate", "roc_auc"),
    "confusion_at": ("zx_spark.operators.evaluate", "confusion_at"),
    "pr_curve": ("zx_spark.operators.evaluate", "pr_curve"),
    "numeric_psi": ("zx_spark.operators.datadrift", "numeric_psi"),
    "categorical_psi": ("zx_spark.operators.datadrift", "categorical_psi"),
    "drift_report": ("zx_spark.operators.datadrift", "drift_report"),
    "common_paths": ("zx_spark.operators.paths", "common_paths"),
    "next_step_distribution": ("zx_spark.operators.paths", "next_step_distribution"),
    "pack_concat": ("zx_spark.operators.packing", "pack_concat"),
    "pack_concat_stats": ("zx_spark.operators.packing", "pack_concat_stats"),
    "pack_greedy": ("zx_spark.operators.packing", "pack_greedy"),
}


def __getattr__(name):
    # Lazy facade/shim exports — keep `import zx_spark` light.
    if name == "ZX":
        from zx_spark.api import ZX

        return ZX
    if name in ("zx_sql", "parse_zx_sql", "ZxCompat", "Passthrough"):
        import zx_spark.sqlshim as _shim

        return getattr(_shim, name)
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'zx_spark' has no attribute {name!r}")


__all__ = [
    "Aggregate",
    "Cmp",
    "Condition",
    "Query",
    "Select",
    "ZX",
    "ZxCompat",
    "compile_query",
    "get_spark",
    "parse_zx_sql",
    "run_query",
    "run_sorted",
    "zx_sql",
]

__version__ = "0.2.0"
