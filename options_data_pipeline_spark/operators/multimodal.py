"""Multimodal column operators: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB scale:

- media rides in DataFrames as an opaque ``binary`` column plus a typed
  metadata struct — Spark shuffles/partitions bytes without interpreting
  them, and partition sizing (``spark.sql.files.maxPartitionBytes``)
  keeps Arrow batches bounded.
- decode / feature-extraction / resize / frame-sampling run as
  ``mapInPandas`` Pandas iterators: Arrow moves each partition to Python
  in zero-copy batches, the per-batch loop stays vectorized, and the
  outputs are ordinary columns again. Everything *around* the codec —
  schema, batch shape, partition parallelism — is real Spark plumbing
  and is tested; only the codec kernel itself is swapped.
- the codec kernel: this container has no image/audio libraries, so
  kernels call :func:`_decode_kernel`, which uses a clearly-marked
  deterministic fake (byte statistics) and shows exactly where
  PIL/libav would slot in (import-try, ``NotImplementedError`` if a
  real decode is requested without the library).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder, absent in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sum_bytes long, payload_md5 string"
)
RESIZE_SCHEMA = "media_id long, kind string, payload binary, width int, height int"
FRAME_SCHEMA = "media_id long, frame_no long, frame binary, frame_md5 string"


def _decode_kernel(payload: bytes) -> dict:
    """Deterministic FAKE decode — byte statistics standing in for pixel
    statistics. A real implementation opens ``payload`` with PIL/libav;
    the surrounding Spark plumbing is identical either way.

    NB: UDF closures must NOT reference this module-level function
    directly — cloudpickle would serialize it *by reference* and the
    Python workers of a caller-provided SparkSession cannot import this
    package (it is on the driver's sys.path only). Each mapInPandas
    closure below binds an inline copy so it pickles *by value*.
    """
    return {
        "n_bytes": len(payload),
        "sum_bytes": sum(payload),
        "payload_md5": hashlib.md5(payload).hexdigest(),
    }


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat each document's UTF-8 bytes as an opaque payload so
    the multimodal plumbing is exercisable against the benchmark corpus
    (kind cycles deterministically through the three modalities)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Per-payload features via ``mapInPandas`` (one Arrow batch at a
    time, partition-parallel)."""
    if real_decode and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed; "
            "use real_decode=False for the deterministic fake kernel"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def kernel(payload: bytes) -> dict:  # inline copy of _decode_kernel
            return {
                "n_bytes": len(payload),
                "sum_bytes": sum(payload),
                "payload_md5": _hl.md5(payload).hexdigest(),
            }

        for pdf in it:
            feats = [kernel(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_payloads(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """'Resize' every payload to width*height bytes (truncate or cycle-pad
    — the deterministic fake for a thumbnailing kernel)."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                bytes((p * (target // max(len(p), 1) + 1))[:target])
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 64, every_n: int = 2) -> DataFrame:
    """Split each payload into fixed-size 'frames' and keep every n-th —
    the fake for video frame sampling. One input row fans out to many
    output rows, which is exactly what mapInPandas allows (unlike a
    scalar pandas_udf)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames, hashes = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                chunks = [
                    p[i : i + frame_bytes] for i in range(0, len(p), frame_bytes)
                ]
                for no, chunk in enumerate(chunks):
                    if no % every_n:
                        continue
                    ids.append(mid)
                    nos.append(no)
                    frames.append(bytes(chunk))
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": frames,
                 "frame_md5": hashes}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
