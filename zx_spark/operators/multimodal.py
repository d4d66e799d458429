"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, batch iteration, partition-preserving
transforms) is real and tested; the actual media decoding is STUBBED —
image/audio libraries are not in this container — behind
``decode_image(..., decoder=...)``:

- ``decoder=None`` (default) raises ``NotImplementedError`` at execution,
  marking exactly where a real decoder (PIL/libvips/ffmpeg) plugs in;
- ``decoder="fake"`` runs a deterministic stand-in (hash-derived pixels)
  so the distributed pipeline — batch shapes, schema contracts,
  per-partition behavior — is exercised end-to-end in tests.

At 100 TB: binary payloads dominate row size, so media tables should set a
small ``spark.sql.files.maxPartitionBytes`` and these transforms are
deliberately mapInPandas (no shuffle, streams Arrow batches, bounded
memory per batch via ``maxRecordsPerBatch``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media(
    df: DataFrame,
    payload_col: str,
    fmt_col: str | None = None,
    width_col: str | None = None,
    height_col: str | None = None,
) -> DataFrame:
    """Normalize a raw binary column into the engine's media convention:
    ``media BINARY`` + ``media_meta STRUCT(format, width, height, n_bytes)``."""
    meta = F.struct(
        (F.col(fmt_col) if fmt_col else F.lit(None).cast("string")).alias("format"),
        (F.col(width_col) if width_col else F.lit(None).cast("int")).alias("width"),
        (F.col(height_col) if height_col else F.lit(None).cast("int")).alias("height"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )
    return df.withColumn("media", F.col(payload_col).cast("binary")).withColumn(
        "media_meta", meta
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a real decoder: feature ``i`` is derived
    from ``md5(payload + b":" + str(i))``. Stable across runs/partitions,
    and — deliberately — reproducible in ANSI SQL
    (``('0x' || substr(md5(text || ':' || i), 1, 8))::bigint``) so the
    driver's DuckDB oracle can verify the full mapInPandas path
    value-for-value, not just row counts."""
    import hashlib

    if payload is None:
        payload = b""
    feats = []
    for i in range(n_features):
        h = int(hashlib.md5(payload + b":%d" % i).hexdigest()[:8], 16)
        feats.append((h % 10_000) / 10_000.0)
    return feats


def decode_image(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    n_features: int = 8,
    decoder: str | None = None,
) -> DataFrame:
    """Decode/feature-extract a media column → ``(id, features array<double>)``.

    Arrow-batched mapInPandas: one Python roundtrip per batch, not per row;
    no shuffle (narrow transform). The real decode is stubbed — see module
    docstring."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    use_fake = decoder == "fake"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real image decoding requires PIL/libvips (not in this "
                    "container); pass decoder='fake' for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _fake_decode(p, n_features) for p in pdf[media_col]
                    ],
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, schema=out_schema)


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder: str | None = None,
) -> DataFrame:
    """Resize a media column → ``(id, media binary, media_meta)`` with the
    target dimensions. Same stub contract as ``decode_image``: the real
    resampler (PIL/libvips) raises ``NotImplementedError`` until plugged
    in; ``decoder='fake'`` emits a deterministic payload of exactly
    width×height bytes so the schema/batching contract is exercised."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META),
        ]
    )
    use_fake = decoder == "fake"
    n_bytes = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real image resizing requires PIL/libvips (not in this "
                    "container); pass decoder='fake' for the deterministic stub"
                )
            payloads = [
                bytes(
                    _int_bytes(_fake_decode(p, 8), n_bytes)
                )
                for p in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": payloads,
                    "media_meta": [
                        {"format": "raw", "width": width, "height": height, "n_bytes": n_bytes}
                        for _ in payloads
                    ],
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, schema=out_schema)


def _int_bytes(seed_feats: list[float], n: int) -> bytearray:
    """Deterministic n-byte payload derived from the fake-decode features."""
    out = bytearray(n)
    acc = 0
    for i in range(n):
        acc = (acc * 31 + int(seed_feats[i % len(seed_feats)] * 10_000) + i) % 256
        out[i] = acc
    return out


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    frame_bytes: int = 16,
) -> DataFrame:
    """Frame sampling for video-like payloads, as pure JVM byte slicing:
    one "frame" (binary slice) every ``every_n_bytes``. Demonstrates the
    explode-to-frames shape (id, frame_no, frame) a real ffmpeg-backed
    sampler would produce."""
    n_frames = F.greatest(
        F.floor(F.length(F.col(media_col)) / every_n_bytes).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(F.col(media_col), i * every_n_bytes + 1, frame_bytes),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(frames).alias("frame_no", "frame"),
    )


# --------------------------------------------------- header-level probing
#
# REAL media parsing with no external decoder: container headers (PNG
# IHDR, GIF logical screen descriptor, JPEG SOF segments, WAV fmt chunk)
# are stdlib byte arithmetic. This upgrades ingest from "trust the
# upstream metadata" to "verify it from the bytes" — corrupt payloads,
# mislabeled formats and absurd dimensions are caught at the scan,
# before any (expensive, plugged-in) pixel decoder runs.

_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


def probe_media_bytes(payload: bytes) -> dict:
    """Parse one payload's container header (pure stdlib; driver-side
    twin of the distributed probe). Returns the _PROBE_SCHEMA fields;
    ``format`` None and ``valid`` False when no known magic matches or
    the header is truncated/corrupt."""
    import struct

    out = {
        "format": None, "width": None, "height": None,
        "sample_rate": None, "n_channels": None,
        "n_bytes": len(payload) if payload is not None else 0,
        "valid": False,
    }
    if not payload:
        return out
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            # IHDR is always the first chunk: length(4) type(4) W(4) H(4)
            if payload[12:16] == b"IHDR":
                w, h = struct.unpack(">II", payload[16:24])
                out.update(format="png", width=w, height=h, valid=True)
        elif payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            out.update(format="gif", width=w, height=h, valid=True)
        elif payload[:2] == b"\xff\xd8":
            # JPEG: walk segments to the first SOF0-SOF15 frame header
            i = 2
            while i + 9 <= len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    out.update(format="jpeg", width=w, height=h, valid=True)
                    break
                i += 2 + seg_len
        elif (
            payload[:4] == b"RIFF"
            and len(payload) >= 36
            and payload[8:12] == b"WAVE"
        ):
            # fmt chunk: channels @22(2 LE), sample rate @24(4 LE)
            if payload[12:16] == b"fmt ":
                ch = struct.unpack("<H", payload[22:24])[0]
                sr = struct.unpack("<I", payload[24:28])[0]
                out.update(
                    format="wav", sample_rate=sr, n_channels=ch, valid=True
                )
    except (struct.error, IndexError):
        pass  # truncated header -> invalid, never an executor error
    return out


def probe_media(
    df: DataFrame, payload_col: str = "media", out_col: str = "probe"
) -> DataFrame:
    """Distributed header probe: adds ``out_col`` STRUCT(format, width,
    height, sample_rate, n_channels, n_bytes, valid) parsed FROM THE
    BYTES. Arrow-batched mapInPandas, narrow (no shuffle) — header
    parsing touches ≤ a few hundred bytes per row regardless of payload
    size. Use it to validate upstream metadata::

        probed = probe_media(df, "media")
        bad = probed.filter(~F.col("probe.valid")
                            | (F.col("probe.width") != F.col("media_meta.width")))
    """
    src = df.schema.fields
    out_schema = T.StructType([*src, T.StructField(out_col, _PROBE_SCHEMA)])
    names = [f.name for f in src]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf[out_col] = [
                probe_media_bytes(b) for b in pdf[payload_col]
            ]
            yield pdf[names + [out_col]]

    return df.mapInPandas(run, out_schema)
