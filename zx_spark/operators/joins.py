"""Join utilities for skewed keys at scale.

The session enables AQE skew-join splitting (zx_spark.session), which
handles most skew at runtime by splitting oversized sort-merge partitions.
``salted_join`` is the explicit fallback for the cases AQE can't fix —
e.g. a single hot key whose matching SMALL-side rows must be replicated so
the hot key's rows spread over ``salts`` reducers instead of one:

    big ⋈ small on k   →   big+[salt = row_id % s]  ⋈  small×[salt = 0..s-1]
                            on (k, salt)

Correctness: every big row keeps exactly one salt and the small side
carries all salts for each key, so the (k, salt) equi-join matches exactly
the pairs of the original join — verified by test against the unsalted
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salts``
    reducers. ``small`` is replicated ``salts``× — use only when the small
    side is small enough to replicate (the usual skew shape: huge fact,
    modest dim, one hot key)."""
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        # Replicating the small side salts× would emit each unmatched
        # small-side row salts times under right/full-outer joins —
        # silently wrong results, so refuse.
        raise ValueError(f"salted_join supports inner/left/semi/anti joins, got {how!r}")
    b = big.withColumn(SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int"))
    s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = b.join(s, on=[on, SALT], how=how)
    return out.drop(SALT)
