"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's contract for image/audio/video at 100 TB: the payload is an
opaque ``binary`` column (never parsed by Catalyst), metadata travels in
a typed struct next to it, and all per-item decoding runs as
Arrow-batched pandas over ``mapInPandas`` — whole batches of payloads
cross the JVM->Python boundary as Arrow buffers, never row by row.

The actual image/audio codecs are NOT in this container, so the decode
step is a deterministic fake (byte-level features) behind the same
batch-shaped plumbing a real decoder would use; ``decode_payload``
raises ``NotImplementedError`` for real codecs so the seam is explicit.

Scale notes: mapInPandas preserves partitioning (no shuffle); batch size
is bounded by spark.sql.execution.arrow.maxRecordsPerBatch (session.py),
which is the knob that keeps executor Python memory flat when payloads
are megabytes each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, byte_len long, first_byte long, checksum long, thumb_w long"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Stand-in multimodal table: UTF-8 bytes of ``text`` as the opaque
    payload plus a typed metadata struct — the real pipeline would read
    (payload, meta) straight from parquet the same way."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("codec"),
            (F.col("n_chars") % 64 + 1).cast("long").alias("width"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, codec: str) -> bytes:
    """Seam for real decoders. Image/audio libraries are not available
    in this environment — anything but the deterministic fake is
    explicitly unimplemented."""
    if codec == "fake/v1":
        return payload
    raise NotImplementedError(
        f"codec {codec!r}: real decode requires an image/audio library "
        "not present in this container; only the deterministic fake "
        "'fake/v1' is supported"
    )


def decode_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': per-payload byte features via
    mapInPandas. The pandas function receives an iterator of DataFrames
    (one per Arrow batch) — the exact shape a real image decoder /
    resizer / frame-sampler plugs into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                decode_payload(p, m["codec"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in payloads],
                    "first_byte": [p[0] if len(p) else -1 for p in payloads],
                    "checksum": [int(sum(p)) % 256 for p in payloads],
                    "thumb_w": [
                        min(int(m["width"]), 16) for m in pdf["meta"]
                    ],
                }
            )

    return with_payload.mapInPandas(batches, DECODED_SCHEMA)
