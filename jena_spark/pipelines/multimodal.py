"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md driver brief): image/audio/video payloads are opaque
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas``.  The actual codec libraries are not present in this
container, so the decode step is STUBBED (deterministic fake header
parse, or NotImplementedError for real codecs) — the Spark-side plumbing
(schema, batching, partitioning, UDF signature) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("media_type", StringType(), False),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("fake_width", LongType(), True),
        StructField("fake_height", LongType(), True),
    ]
)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads from document text (no external
    media in the sandbox): payload = utf-8 bytes, media_type by id mod 3."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """The decode stage: Arrow-batched ``mapInPandas``.  Real pipeline
    would call PIL/ffmpeg here; the stub derives deterministic fake
    dimensions from the payload hash so tests exercise the full dataflow."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, widths, heights = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(payload)
                h = hashlib.sha256(b).hexdigest()
                shas.append(h)
                if mtype == "image":
                    widths.append(16 + int(h[:4], 16) % 4080)
                    heights.append(16 + int(h[4:8], 16) % 4080)
                else:
                    widths.append(None)
                    heights.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha256": shas,
                    "media_type": pdf["media_type"],
                    "fake_width": pd.array(widths, dtype="Int64"),
                    "fake_height": pd.array(heights, dtype="Int64"),
                }
            )

    return media.mapInPandas(decode, META_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL, not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not installed in this environment; "
        "the pipeline treats payloads as opaque binary (see extract_metadata)"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub: for video payloads, emit one row per sampled
    'frame' (deterministic offsets into the payload — real impl would call
    a demuxer).  Demonstrates the 1→N mapInPandas fan-out shape."""

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", LongType(), False),
            StructField("frame_bytes", BinaryType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, blobs = [], [], []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                b = bytes(payload)
                for i, off in enumerate(range(0, len(b), every_n)):
                    ids.append(mid)
                    nos.append(i)
                    blobs.append(b[off : off + every_n])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame_bytes": blobs}
            )

    return media.mapInPandas(sample, schema)
