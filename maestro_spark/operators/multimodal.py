"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata, processed by Arrow-batched pandas UDFs over
mapInPandas. The Spark-side mechanics (schema, partitioning, UDF signature,
batch shape) are real and tested; the codec step itself is stubbed behind
`decoder=` because no image/audio libraries exist in this container — a
deployment passes e.g. a PIL/torchaudio-backed decoder with the same
(bytes Series) -> (np.ndarray list) contract.

Design for 100 TB of media:
  * payloads stay binary end-to-end — never hex/base64 strings (4/3×
    inflation) and never driver-collected.
  * batch size is bounded by bytes, not rows: a mapInPandas batch of 4096
    × 10 MB videos would OOM an executor, so `max_batch_bytes` re-chunks
    inside the UDF (Spark's arrow batch slicing is row-count based).
  * decode → feature is a narrow map: no shuffle; feature tables are
    written columnar so downstream similarity search reads only the
    feature column (column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta map<string,string>"
)


def fake_decode(payloads: pd.Series, feature_dim: int = 16) -> np.ndarray:
    """Deterministic stand-in decoder: features derived from sha256 of the
    payload bytes (so tests get stable, content-sensitive vectors). A real
    deployment replaces this with an actual image/audio decode — the UDF
    plumbing is identical."""
    out = np.empty((len(payloads), feature_dim), dtype=np.float32)
    for i, b in enumerate(payloads):  # bounded by Arrow batch, not dataset
        h = hashlib.sha256(bytes(b or b"")).digest()
        raw = np.frombuffer((h * ((feature_dim * 4) // len(h) + 1))[: feature_dim * 4],
                            dtype=np.uint32)
        out[i] = (raw % 1_000_003).astype(np.float32) / 1_000_003.0
    return out


def unavailable_decode(payloads: pd.Series, feature_dim: int = 16) -> np.ndarray:
    """The honest stub: the container has no media codecs."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; pass decoder=fake_decode for deterministic tests or "
        "a real codec-backed decoder in deployment"
    )


def extract_features(media: DataFrame, feature_dim: int = 16,
                     decoder: Callable[[pd.Series, int], np.ndarray] = unavailable_decode,
                     max_batch_bytes: int = 64 << 20) -> DataFrame:
    """media(media_id, kind, payload, meta) → (media_id, kind, n_bytes,
    feature array<float>). Narrow Arrow-batched map; payload bytes are
    re-chunked so no in-flight chunk exceeds max_batch_bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            sizes = pdf["payload"].map(lambda b: len(b or b""))
            # byte-bounded rechunk: split where cumulative bytes exceed cap
            cuts, acc = [0], 0
            for i, s in enumerate(sizes):
                acc += int(s)
                if acc > max_batch_bytes and i + 1 > cuts[-1]:
                    cuts.append(i + 1)
                    acc = 0
            cuts.append(len(pdf))
            for a, b in zip(cuts, cuts[1:]):
                if a == b:
                    continue
                chunk = pdf.iloc[a:b]
                feats = decoder(chunk["payload"], feature_dim)
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "kind": chunk["kind"].to_numpy(),
                    "n_bytes": sizes.iloc[a:b].to_numpy(dtype=np.int64),
                    "feature": list(feats),
                })

    return media.mapInPandas(
        run, schema="media_id long, kind string, n_bytes long, feature array<float>"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling on METADATA (n_frames in meta): emits one row
    per sampled frame index — pure column ops (sequence+explode), the
    decode of each frame happens later in extract_features. At scale this
    is the explode that multiplies rows, so it runs AFTER any filters."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("long"), F.lit(1)
    )
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))),
        )
        .select("media_id", "frame_idx", "payload", "meta")
    )


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from a text table (test fixture:
    payload = utf-8 bytes; kind round-robins image/audio/video; meta carries
    typed fields). Gives the multimodal path real distributed input without
    external data."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.map_from_arrays(
            F.array(F.lit("n_frames"), F.lit("codec")),
            F.array((F.col(id_col) % 40 + 1).cast("string"), F.lit("synthetic")),
        ).alias("meta"),
    )
