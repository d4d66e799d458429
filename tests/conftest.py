"""Shared Spark session for the test suite (one JVM for the whole run)."""

from __future__ import annotations

import os

import pytest

from zx_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("ZX_SHUFFLE_PARTITIONS", "4")
    s = get_spark("zx_spark_tests")
    yield s


def drain_memory_sink(out, name: str, checkpoint_dir: str, output_mode: str = "append", timeout_s: int = 120):
    """Shared availableNow drain into a memory table (the streaming test
    pattern repeated across test files — one definition here)."""
    (
        out.writeStream.format("memory").queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(timeout_s)
    )
    return out.sparkSession.table(name)


def pin_file_mtimes_by_event_time(src: str, ts_col: str = "ts") -> None:
    """Order a file-source directory's trigger sequence by EVENT time:
    part-file names don't reflect append order, so maxFilesPerTrigger
    tests pin mtimes from each file's min timestamp. One shared
    definition — the driver-arm staging uses the same helper."""
    from zx_spark.util import pin_file_mtimes_by_min_value

    pin_file_mtimes_by_min_value(src, ts_col)
