"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata structs; all
transforms run as Arrow-batched ``mapInPandas`` so bytes never take the
row-at-a-time pickling path. The actual codecs (PIL/ffmpeg/librosa) are
NOT in this environment, so the decode step is stubbed: with
``fake=True`` (default) a deterministic content-derived feature vector
stands in for real decode output — the Spark-side contract (schemas,
batch iteration, partitioning) is real and tested; with ``fake=False``
the import-gated real decoder raises ``NotImplementedError`` until the
codec libraries are installed.

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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # real decoders are not available in this environment
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:  # pragma: no cover
                    raise NotImplementedError(
                        "real media decode requires codec libraries "
                        "(PIL/ffmpeg/librosa) not present in this image"
                    ) from exc
            contents = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": contents.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "digest": contents.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": contents.map(
                        lambda b: _fake_features(b or b"", dim)
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, digs = [], [], []
            for _, row in pdf.iterrows():
                if not fake:
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg, not present"
                    )
                # meta is a NULLABLE struct — a video row without
                # metadata samples zero frames instead of failing the
                # whole task on None subscripting
                meta = row["meta"]
                duration = (
                    meta["duration_ms"] if meta is not None else 0
                ) or 0
                content = row["content"] or b""
                for ms in range(0, int(duration), every_ms):
                    ids.append(row["media_id"])
                    offs.append(ms)
                    digs.append(
                        hashlib.sha256(
                            content + ms.to_bytes(8, "little")
                        ).hexdigest()
                    )
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
    ``fake=False`` is the import gate for a real PIL resize. Only
    ``kind == 'image'`` rows are processed — the filter is pushed into
    the scan, so audio/video blobs are never shipped to Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL, not present in this "
                    "environment"
                )
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
