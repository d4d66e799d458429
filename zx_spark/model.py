"""Logical query model — the programmatic API of the engine.

Mirrors the reference's ``Query`` / ``QueryFields`` / ``Condition`` / ``Select``
shape (reference src/lib.rs:50-69, 125-176) as Python dataclasses. This is the
*logical* layer only: ``zx_spark.compiler`` lowers a ``Query`` to a Spark
DataFrame plan and Catalyst does the physical planning.

Reserved column conventions (reference src/lib.rs:56-58):
- ``__nil``  — rendered group key for a missing group-by value
- ``__ts``   — implicit event timestamp (here: a real ``ts`` column)
- ``__sample_rate`` — per-row sampling weight (here: ``sample_rate``, NULL→1.0)
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

NIL = "__nil"
TS_COL = "ts"
ID_COL = "id"
SAMPLE_RATE_COL = "sample_rate"


class Cmp(enum.Enum):
    """Filter comparators (reference src/lib.rs:162-176; semantics §2.3 of SURVEY)."""

    EQ = "eq"
    NE = "ne"
    GT = "gt"
    LT = "lt"
    GTE = "gte"
    LTE = "lte"
    EXISTS = "exists"
    NOT_EXISTS = "not_exists"
    STARTS_WITH = "starts_with"
    NOT_STARTS_WITH = "not_starts_with"
    CONTAINS = "contains"
    NOT_CONTAINS = "not_contains"
    # Beyond-reference: real %/_ pattern matching for the SQL shim's
    # non-compat LIKE mode (the reference only has substring LIKE,
    # src/expr.rs:81-89).
    LIKE = "like"
    NOT_LIKE = "not_like"


class Aggregate(enum.Enum):
    """Aggregation functions (reference src/lib.rs:133-143).

    P50 / RAW / HEATMAP are declared-but-unimplemented in the reference
    (``unimplemented!()`` arms, src/lib.rs:659-661); this engine implements
    them for real (SURVEY §7 M2).
    """

    SUM = "sum"
    MAX = "max"
    MIN = "min"
    COUNT = "count"
    COUNT_DISTINCT = "count_distinct"
    # Scale variant beyond the reference: HyperLogLog++ sketch instead of
    # an exact distinct shuffle — the opt-in for 100 TB cardinalities.
    COUNT_DISTINCT_APPROX = "count_distinct_approx"
    MEAN = "mean"
    P50 = "p50"
    # Scale variant beyond the reference: mergeable quantile estimate
    # (percentile_approx sketch on raw events; equi-width histogram
    # partials + interpolation when answered from a rollup). ``params``
    # carries the histogram domain ``(lo, hi, bins)`` on the rollup path.
    P50_APPROX = "p50_approx"
    # Generalized quantile (beyond the reference's P50-only surface):
    # ``params`` LEADS with q in (0, 1) — (q,) on the raw path
    # (percentile_approx sketch), (q, lo, hi, bins) on the rollup path
    # (histogram domain defaults to QUANTILE_BINS). P90/P99 for
    # latency-style dashboards.
    QUANTILE_APPROX = "quantile_approx"
    RAW = "raw"
    HEATMAP = "heatmap"


@dataclass(frozen=True)
class Condition:
    """``col <cmp> value`` — conditions in a query are ANDed
    (reference src/lib.rs:66, applied as successive set intersections
    src/lib.rs:197-200)."""

    column: str
    cmp: Cmp
    value: str | int | float | None = None


@dataclass(frozen=True)
class Select:
    """One SELECT item: an aggregate applied to a column.

    ``params`` carries aggregate-specific parameters: for HEATMAP it is
    ``(lo, hi, bins)`` (default ``(0.0, 1000.0, 10)``); for P50 it is unused
    (the quantile is fixed by the function name, reference src/expr.rs:136).
    """

    column: str
    aggregate: Aggregate
    params: tuple = ()

    @property
    def key(self) -> str:
        """Result key format ``$$agg(col)`` (reference src/lib.rs:801-813)."""
        return f"$${self.aggregate.value}({self.column})"

    @property
    def alias(self) -> str:
        """SQL-safe flat alias for DataFrame results. QUANTILE_APPROX
        folds q into the name (``p90_approx__col``) so two quantiles of
        one column coexist in a result frame."""
        if self.aggregate is Aggregate.QUANTILE_APPROX and self.params:
            q = float(self.params[0])
            qtag = f"p{q * 100:g}".replace(".", "_")
            return f"{qtag}_approx__{self.column}".replace(".", "_")
        return f"{self.aggregate.value}__{self.column}".replace(".", "_")


@dataclass
class Query:
    """Full query (reference ``Query``/``QueryFields`` src/lib.rs:50-69).

    ``granularity_s`` is the window width in seconds (reference hardcodes
    300s for SQL, src/expr.rs:224-227; tests use 15s). ``granularity_s=None``
    means no time windowing — one window per group (the reference's
    ``run_sorted`` behavior, src/lib.rs:744).

    ``window_mode``:
    - ``"aligned"``  — idiomatic epoch-aligned tumbling windows
      (``F.window``); the scale path.
    - ``"session"``  — gap-based data-aligned windows via lag/cumsum
      (JVM-side, spillable) — the scale-safe approximation of the
      reference's data-aligned intent.
    - ``"faithful"`` — reference-exact data-aligned windows (SURVEY §2.6),
      including the breaking-row-drop quirk (src/lib.rs:711-713);
      compat/oracle mode (per-group sequential).
    """

    selects: list[Select] = field(default_factory=list)
    conditions: list[Condition] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (select key, asc)
    t_start: float | None = None  # unix seconds, inclusive
    t_end: float | None = None  # unix seconds, inclusive
    granularity_s: float | None = None
    window_mode: str = "aligned"
    # Multi-dimensional grouping (beyond the reference's single tuple,
    # src/lib.rs:547-556): None = plain GROUP BY; "cube" / "rollup" /
    # an explicit list of grouping sets routes compilation through
    # operators/olap.multidim_agg's one-Expand plan. Set by the SQL
    # shim's GROUP BY CUBE(...) / ROLLUP(...) / GROUPING SETS(...)
    # spellings.
    group_mode: str | list[list[str]] | None = None
    # True iff the query text carried an explicit GRANULARITY clause (vs
    # inheriting the session default). Grouping-set queries don't window,
    # so an explicit clause there must raise instead of being dropped.
    granularity_explicit: bool = False
    # Beyond-reference LIMIT n (the reference dialect has none): valid
    # only with ORDER BY — a cut without a total order would return an
    # arbitrary subset. run_sorted appends the group keys as final
    # tie-breakers so the cut is deterministic at ties.
    limit: int | None = None
    # Beyond-reference HAVING: post-aggregation numeric predicates as
    # (select ALIAS e.g. "sum__foo", op, value) triples — the alias (not
    # the $$key) because two pNN quantiles of one column share a key but
    # never an alias. Applied as a plain filter on the aggregate's
    # output column in every aggregate path (windowed, sorted, multidim).
    having: list[tuple[str, str, float]] = field(default_factory=list)
