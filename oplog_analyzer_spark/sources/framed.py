"""S3 — framed binary log-file source (raw-log parity path).

The reference reads length-prefixed (int32 little-endian) concatenated BSON
documents from files, transparently gunzipping and sanity-checking each
frame to 5 B ≤ size ≤ 16 MB (BaseOplogCommand.java:298-384, size check
:347).  Columnar parquet replaces this at rest (sources/tables.py), but for
parity with raw dumps this module reads the same framing via
``spark.read.format("binaryFile")`` + an Arrow-batched splitter:

  * one task per file (binaryFile gives (path, content) rows) — framing is
    inherently sequential within a file, parallel across files, exactly the
    reference's one-thread-per-file layout (AnalyzeCommand.java:188-247);
  * the shard id is recovered from the filename (P9,
    AnalyzeCommand.java:537-549).

At 100 TB the guidance stands: convert once to parquet/Iceberg and use the
columnar path; this source exists so users with .bin.gz dumps can run the
same queries without a pre-conversion step.
"""

from __future__ import annotations

import gzip
import io
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MIN_FRAME = 5
MAX_FRAME = 16 * 1024 * 1024

FRAMED_SCHEMA = "shard string, seq long, payload binary"


def write_framed_file(path: str, payloads: list[bytes], compress: bool = False) -> None:
    """Test/interop helper: write length-prefixed frames, optionally gzip."""
    buf = io.BytesIO()
    for p in payloads:
        buf.write(struct.pack("<i", len(p)))
        buf.write(p)
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def _split_frames(content: bytes) -> Iterator[bytes]:
    if content[:2] == b"\x1f\x8b":  # gzip magic — transparent decompress
        content = gzip.decompress(content)
    off, n = 0, len(content)
    while off + 4 <= n:
        (size,) = struct.unpack_from("<i", content, off)
        if size < MIN_FRAME or size > MAX_FRAME:
            raise ValueError(f"invalid frame size {size} at offset {off}")
        off += 4
        if off + size > n:
            raise ValueError(f"truncated frame at offset {off}")
        yield content[off : off + size]
        off += size


def _shard_from_path(path: str) -> str:
    """P9 — filename → shard id: strip extensions, take the last '_' token
    (AnalyzeCommand.java:537-549)."""
    name = path.rsplit("/", 1)[-1]
    for suffix in (".gz", ".bin", ".bson"):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
    return name.rsplit("_", 1)[-1] if "_" in name else name


def read_framed(spark: SparkSession, path_glob: str) -> DataFrame:
    """DataFrame of (shard, seq, payload) from framed binary files."""
    files = spark.read.format("binaryFile").load(path_glob)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_shard, out_seq, out_payload = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = _shard_from_path(path)
                for i, frame in enumerate(_split_frames(bytes(content))):
                    out_shard.append(shard)
                    out_seq.append(i)
                    out_payload.append(frame)
            yield pd.DataFrame(
                {"shard": out_shard, "seq": out_seq, "payload": out_payload}
            )

    return files.select("path", "content").mapInPandas(split, schema=FRAMED_SCHEMA)
