"""Source connectors — the generalization of the reference's single
ingestion path (RDB files piped via redis-cli, Makefile:1-2 +
fixtures/test.cmd). Spark-first: every reader returns a DataFrame with the
events-table conventions applied (id, ts, typed attrs), every format is a
first-class citizen (Parquet / CSV / JSON / in-memory rows)."""

from zx_spark.sources.readers import (
    read_csv_events,
    read_json_events,
    read_orc_events,
    read_parquet_events,
    rows_to_events,
)

__all__ = [
    "read_csv_events",
    "read_json_events",
    "read_orc_events",
    "read_parquet_events",
    "rows_to_events",
]
