"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata structs; all
transforms run as Arrow-batched ``mapInPandas`` so bytes never take the
row-at-a-time pickling path. The actual codecs (PIL/ffmpeg/librosa) are
NOT in this environment, so the decode step is stubbed: with
``fake=True`` (default) a deterministic content-derived feature vector
stands in for real decode output — the Spark-side contract (schemas,
batch iteration, partitioning) is real and tested; with ``fake=False``
always raises ``NotImplementedError`` at call time — the real decoders
have not been written, and the gate must not depend on whether a codec
library happens to be importable or on the input being non-empty.

Scale notes: media rows are large — repartition by size budget before
heavy decode (``spark.sql.files.maxPartitionBytes`` governs scan-side
splits), keep features separate from raw bytes so downstream analytics
never rescans blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _require_fake(fake: bool, what: str) -> None:
    """The real decode path is NOT implemented anywhere in this module
    (this environment has no codec libraries, and no real decoder has
    been written): ``fake=False`` must fail fast and consistently at
    CALL time — not per batch (skipped on empty partitions), not per
    row (skipped on empty input), and never by silently falling back
    to fake output when a codec library happens to be importable."""
    if not fake:
        raise NotImplementedError(
            f"real {what} is not implemented; this module ships the "
            "Spark-side plumbing with a deterministic fake decoder "
            "(fake=True). Wire PIL/ffmpeg into the mapInPandas body "
            "when codecs are available."
        )


def _fake_features(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded feature vector: bytes of
    repeated sha256 → scaled to [0, 1). Same contract shape as a real
    embedding; NOT semantically meaningful."""
    out = np.empty(dim, dtype=np.float32)
    need = dim
    seed = content or b""
    pos = 0
    while need > 0:
        seed = hashlib.sha256(seed).digest()
        take = min(need, len(seed))
        out[pos : pos + take] = np.frombuffer(seed[:take], dtype=np.uint8) / 256.0
        pos += take
        need -= take
    return out


def extract_features(
    media: DataFrame, *, dim: int = 16, fake: bool = True
) -> DataFrame:
    """Decode + feature-extract each media blob → (media_id, kind,
    n_bytes, digest, features). Arrow-batched; one pandas frame per
    partition chunk."""

    _require_fake(fake, "media decode")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            # NULL content stays NULL (missing media), distinct from a
            # genuinely zero-byte blob — FEATURES_SCHEMA marks these
            # nullable for exactly this case
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": contents.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "digest": contents.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": contents.map(
                        lambda b: _fake_features(b, dim)
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame, *, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset
    (media_id, frame_ms, frame_digest). With the fake decoder, frame
    count comes from meta.duration_ms and digests are content+offset
    hashes — the row-explosion shape of real frame sampling."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame_digest", T.StringType(), True),
        ]
    )

    _require_fake(fake, "frame sampling")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                # meta is a NULLABLE struct — a video row without
                # metadata samples zero frames instead of failing the
                # whole task on None subscripting
                meta = row["meta"]
                duration = (
                    meta["duration_ms"] if meta is not None else 0
                ) or 0
                if not duration:
                    continue
                content = row["content"] or b""
                # hash the blob ONCE; per-frame digests extend the
                # saved hash state (hashlib.copy), so the value equals
                # sha256(content + ms_bytes) at O(1) per frame instead
                # of re-hashing a possibly-huge blob per frame
                base = hashlib.sha256(content)
                ids, offs, digs = [], [], []
                for ms in range(0, int(duration), every_ms):
                    h = base.copy()
                    h.update(ms.to_bytes(8, "little"))
                    ids.append(row["media_id"])
                    offs.append(ms)
                    digs.append(h.hexdigest())
                # yield per input row: frame lists stay bounded by one
                # video's frame count, not the whole Arrow batch
                yield pd.DataFrame(
                    {"media_id": ids, "frame_ms": offs, "frame_digest": digs}
                )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=out_schema
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    *,
    fake: bool = True,
) -> DataFrame:
    """Image resize plumbing: images in, fixed-(width, height) images
    out, Arrow-batched. With the fake decoder the output bytes are a
    deterministic content+size-derived stand-in (digest pins the
    contract: same input and target size → same bytes on any executor);
    ``fake=False`` raises at call time (no real resize exists). Only
    ``kind == 'image'`` rows are processed — the filter is pushed into
    the scan, so audio/video blobs are never shipped to Python."""

    _require_fake(fake, "image resize")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, digests = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                if content is None:
                    contents.append(None)
                    digests.append(None)
                    continue
                seed = hashlib.sha256(
                    bytes(content) + f"|{width}x{height}".encode()
                ).digest()
                # deterministic fake pixel buffer of the target size
                reps = (width * height * 3) // len(seed) + 1
                buf = (seed * reps)[: width * height * 3]
                contents.append(buf)
                digests.append(hashlib.sha256(buf).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "content": contents,
                    "digest": digests,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )
