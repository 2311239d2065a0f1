"""Multimodal-column plumbing (SURVEY.md §2.3 #44).

Treats media as opaque ``binary`` payload columns with typed metadata,
processed by Arrow-batched ``mapInPandas``. The actual media decode
(image/audio libs are not in this container) is STUBBED behind
``decode_media`` — the Spark-side plumbing (schema, batching, UDF
signature) is real and oracle-checked via deterministic fake features.

Scale notes: mapInPandas streams Arrow record batches — payload bytes
never materialize on the driver, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Partitioning is
inherited from the scan; a real pipeline would repartition by payload
size to balance decode cost.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zigchain_indexer_clickhouse_spark.catalog import load
from zigchain_indexer_clickhouse_spark.plans.registry import register

_OUT_SCHEMA = (
    "doc_id long, payload_bytes long, head_checksum int, fake_feature int"
)


def decode_media(payload: bytes, media_type: str) -> object:
    """Real media decode — NOT implementable in this container (no
    image/audio libs). The pipeline below uses deterministic fake
    features instead; this hook is where PIL/soundfile/av would plug in."""
    raise NotImplementedError(
        f"media decode for {media_type!r} requires codec libraries not "
        "present in this environment"
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic stand-in for decode+featurize: payload size, a
    checksum over the first 16 characters' codepoints, and a derived
    fake feature — all replayable in SQL for the oracle.
    """
    for pdf in batches:
        payload_bytes = pdf["payload"].str.len().astype("int64")
        # codepoint-sum of the first 16 chars, vectorized: pad the
        # slice to exactly 16 chars with NUL (codepoint 0 — identity
        # for the sum), decode the whole batch as one utf-32 buffer,
        # and sum row-wise in numpy. No per-row Python lambda.
        head = (
            pdf["text"].str.slice(0, 16).str.pad(16, side="right", fillchar="\x00")
        )
        codes = np.frombuffer(
            "".join(head.tolist()).encode("utf-32-le"), dtype=np.uint32
        ).reshape(-1, 16)
        head_checksum = pd.Series(
            codes.sum(axis=1) % 256, index=pdf.index
        ).astype("int32")
        fake_feature = ((payload_bytes * 31 + head_checksum) % 1000).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": payload_bytes,
                "head_checksum": head_checksum,
                "fake_feature": fake_feature,
            }
        )


@register(
    "multimodal_pipeline",
    oracle="""
    WITH cs AS (
      SELECT d.doc_id, SUM(ord(substr(d.text, g.i, 1))) AS s
      FROM documents d, generate_series(1, 16) g(i)
      WHERE g.i <= length(d.text)
      GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS payload_bytes,
           CAST(cs.s % 256 AS INT) AS head_checksum,
           CAST((octet_length(encode(d.text)) * 31 + cs.s % 256) % 1000 AS INT)
             AS fake_feature
    FROM documents d JOIN cs ON cs.doc_id = d.doc_id
    """,
)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline: documents.text re-encoded as an opaque
    binary ``payload`` column (stand-in for image/audio bytes) plus
    metadata, fed through Arrow-batched mapInPandas feature extraction.
    The decode step itself is stubbed (see decode_media); everything
    Spark-side — schema, batch shape, binary transport — is real."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.col("text").cast("binary").alias("payload")
    )
    return d.mapInPandas(_extract_features, schema=_OUT_SCHEMA)


# --------------------------------------------------------------------------
# 87. multimodal_resize — image-resize metadata pipeline (decode stubbed)
# --------------------------------------------------------------------------
_RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, out_w int, out_h int, scale_pct int"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Aspect-preserving resize to a 256px max side. The pixel work is
    what decode_media would do; the dimension math (the part that
    drives batch sizing and output schemas in a real pipeline) is real
    and computed vectorized per Arrow batch."""
    for pdf in batches:
        src_w = (320 + (pdf["doc_id"] % 5) * 160).astype("int32")
        src_h = (240 + (pdf["doc_id"] % 3) * 120).astype("int32")
        long_side = src_w.where(src_w >= src_h, src_h)
        # integer permille scale avoids float divergence with the oracle
        scale_pct = (256 * 1000 // long_side).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_w": src_w,
                "src_h": src_h,
                "out_w": (src_w * scale_pct // 1000).astype("int32"),
                "out_h": (src_h * scale_pct // 1000).astype("int32"),
                "scale_pct": scale_pct.astype("int32"),
            }
        )


@register(
    "multimodal_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(320 + (doc_id % 5) * 160 AS INT) AS src_w,
             CAST(240 + (doc_id % 3) * 120 AS INT) AS src_h
      FROM documents
    )
    SELECT doc_id, src_w, src_h,
           CAST(src_w * (256000 // greatest(src_w, src_h)) // 1000 AS INT)
             AS out_w,
           CAST(src_h * (256000 // greatest(src_w, src_h)) // 1000 AS INT)
             AS out_h,
           CAST(256000 // greatest(src_w, src_h) AS INT) AS scale_pct
    FROM dims
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize stage: typed (width, height) metadata rides next to
    the opaque payload; the aspect-preserving target-dimension math runs
    vectorized per Arrow batch in mapInPandas (integer permille scaling
    so the oracle replays exactly). Source dims are derived
    deterministically from doc_id — the decode that would read them
    from real image headers is the stubbed step (see decode_media)."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


# --------------------------------------------------------------------------
# 88. multimodal_frame_sample — video frame sampling (1→N expansion)
# --------------------------------------------------------------------------
_FRAME = 32       # "frame" = 32-char slice of the payload
_STRIDE = 4       # sample every 4th frame

_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_checksum int"


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Frame sampling: each payload expands to ceil(n_frames/stride)
    output rows — the 1→N shape (and Arrow batch-size discipline) of
    real video pipelines. Checksum stands in for the per-frame decode."""
    for pdf in batches:
        ids, idxs, sums = [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n_frames = len(text) // _FRAME
            for f in range(0, n_frames, _STRIDE):
                ids.append(doc_id)
                idxs.append(f)
                sums.append(
                    sum(ord(c) for c in text[f * _FRAME : (f + 1) * _FRAME]) % 256
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_checksum": pd.Series(sums, dtype="int32"),
            }
        )


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT d.doc_id, g.i * {_STRIDE} AS frame_idx, d.text
      FROM documents d, generate_series(0, 1000) g(i)
      WHERE g.i * {_STRIDE} < length(d.text) // {_FRAME}
    )
    SELECT f.doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
           CAST(SUM(ord(substr(f.text, f.frame_idx * {_FRAME} + g.j + 1, 1)))
                % 256 AS INT) AS frame_checksum
    FROM frames f, generate_series(0, {_FRAME - 1}) g(j)
    GROUP BY f.doc_id, f.frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling stage: the payload is treated as a sequence
    of fixed-size frames; every {_STRIDE}th frame is extracted with a
    per-frame checksum (stand-in for the stubbed decode). Exercises the
    1→N row expansion through mapInPandas — output rows ≫ input rows,
    which is why this runs as a streaming Arrow transform and never
    collects a document's frames into one driver-side list."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_frame_sample_batches, schema=_FRAME_SCHEMA)
