"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

New capability beyond the reference (CASIE is text-only).  The
container has no image/audio codecs, so the *decode* kernels are
deterministic stubs behind ``REAL_DECODERS`` (a real deployment swaps
in PIL/ffmpeg inside the same UDF body) — but everything Spark-side is
real and tested: the binary schema, the mapInPandas signature, the
Arrow batch shape, and the partitioning contract (payload stages
repartition by a uniform hash so one hot domain's media cannot
straggle an executor, mirroring pipeline.salt_repartition).

At 100 TB the rule embodied here: keep payload bytes OUT of shuffles.
Metadata extraction projects narrow columns first; the binary column is
only read inside the scan-adjacent mapInPandas stage, never grouped or
joined on.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REAL_DECODERS = False  # no PIL/ffmpeg/librosa in this container

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, content_sha string"
)
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_no int, frame_sha string"
)


def attach_binary(docs: DataFrame, text_col: str = "text",
                  media_type: str = "image/png") -> DataFrame:
    """Attach a synthetic payload column (binary) + media_type.  Stands
    in for the WARC ``html:binary`` / media payload of the real table
    (BASELINE.json input_hint)."""
    return docs.withColumn("blob", F.encode(F.col(text_col), "UTF-8")) \
               .withColumn("media_type", F.lit(media_type))


def media_metadata(docs: DataFrame) -> DataFrame:
    """Narrow metadata over the binary column — stays JVM-side (no
    Python): byte length + content hash for dedup/lineage."""
    return docs.select(
        "doc_id", "media_type",
        F.length("blob").cast("long").alias("n_bytes"),
        F.md5("blob").alias("content_sha"),
    )


def _stub_decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decode: dimensions and an 8-d feature vector
    derived from the content digest.  Replace with PIL decode +
    model.encode() when REAL_DECODERS."""
    d = hashlib.md5(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feat = np.frombuffer(d[:8], dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, feat


def extract_image_features(docs: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas image decode + feature extraction.  Arrow streams
    binary batches to Python; each batch is decoded vectorized-per-
    batch (one Python call per ~batch_hint rows, never per-row in the
    planner's eyes)."""
    if REAL_DECODERS:  # pragma: no cover
        raise NotImplementedError("real codecs not available in container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_stub_decode_image(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "width": [r[0] for r in rows],
                "height": [r[1] for r in rows],
                "feature": [r[2] for r in rows],
            })

    narrow = docs.select("doc_id", "blob")
    return narrow.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(docs: DataFrame, every_n: int = 10,
                  n_frames: int = 3) -> DataFrame:
    """Video frame-sampling stub: emits n_frames rows per doc with a
    per-frame digest (real impl: ffmpeg seek + JPEG encode inside the
    same mapInPandas body).  Demonstrates the 1->N exploding UDF shape
    with a bounded fan-out."""
    if REAL_DECODERS:  # pragma: no cover
        raise NotImplementedError("real codecs not available in container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_no, out_sha = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                for i in range(n_frames):
                    chunk = raw[i * every_n:(i + 1) * every_n] or b"\x00"
                    out_doc.append(doc_id)
                    out_no.append(i)
                    out_sha.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({
                "doc_id": out_doc, "frame_no": out_no, "frame_sha": out_sha,
            })

    return docs.select("doc_id", "blob").mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
