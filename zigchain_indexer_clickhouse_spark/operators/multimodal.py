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
        payload_bytes = pdf["payload"].map(len).astype("int64")
        head_checksum = pdf["text"].map(
            lambda t: sum(ord(c) for c in t[:16]) % 256
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
