"""flatten_json_props (sources/readers.py): schema inference, nested
dotted flattening, stringly mode, malformed rows, and the end-to-end
reference story — a dotted column queried through the zx SQL shim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zx_spark.sources.readers import _merge_json_schema, flatten_json_props


def test_merge_json_schema_types_and_conflicts():
    sch = _merge_json_schema(
        [
            '{"a": 1, "b": "x", "c": {"d": 1.5}}',
            '{"a": 2.5, "b": true, "e": 7}',
            "not json at all",
        ]
    )
    fields = {f.name: f.dataType for f in sch.fields}
    assert isinstance(fields["a"], T.DoubleType)  # long + double widens
    assert isinstance(fields["b"], T.StringType)  # string + boolean widens
    assert isinstance(fields["c"], T.StructType)
    assert isinstance(fields["e"], T.LongType)


def test_flatten_nested_dotted_columns(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 1, "repo": {"name": "zx", "stars": 7}}'),
            (2, '{"k": 2, "repo": {"name": "other"}}'),
            (3, "broken {"),
            (4, None),
        ],
        "id long, props string",
    )
    out = flatten_json_props(df, "props")
    assert set(out.columns) == {"id", "props.k", "props.repo.name", "props.repo.stars"}
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["props.repo.name"] == "zx" and rows[1]["props.repo.stars"] == 7
    assert rows[2]["props.repo.stars"] is None
    assert rows[3]["props.k"] is None and rows[4]["props.k"] is None


def test_stringly_mode_and_keep_col(spark):
    df = spark.createDataFrame([(1, '{"k": 69}')], "id long, props string")
    out = flatten_json_props(df, "props", stringly=True, drop=False)
    assert "props" in out.columns
    r = out.collect()[0]
    assert r["props.k"] == "69"  # all-strings reference value model


def test_explicit_schema_skips_sampling(spark):
    df = spark.createDataFrame([(1, '{"k": 69, "zz": 1}')], "id long, props string")
    out = flatten_json_props(df, "props", schema="k long")
    assert set(out.columns) == {"id", "props.k"}


def test_end_to_end_shim_query_on_dotted_column(spark):
    """The reference README story (`select count(repo.name) ...`,
    README.md:16): ingest JSON props, flatten to dotted columns, query
    them through the zx SQL dialect."""
    from zx_spark.api import ZX
    from zx_spark.storage import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    flat = flatten_json_props(ev, "props")
    assert "props.k" in flat.columns
    z = ZX(spark, events_df=flat, id_col="event_id", rate_col=None)
    got = z.df("select sum(props.k) where props.k > 50 granularity 1000000000").collect()
    direct = flat.filter(F.col("`props.k`") > 50).agg(
        F.sum(F.col("`props.k`").cast("double")).alias("s")
    ).first()["s"]
    assert len(got) == 1
    agg_cols = [c for c in got[0].asDict() if c.startswith("sum__props")]
    assert agg_cols and got[0][agg_cols[0]] == pytest.approx(direct)
