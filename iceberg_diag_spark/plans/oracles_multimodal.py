"""Multimodal binary-payload columns over documents.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from iceberg_diag_spark.operators import (
    multimodal,
)
from iceberg_diag_spark.plans.common import _t


# Multimodal columns (binary payload + typed metadata over documents;
# payloads are deterministic UTF-8 encodings and the corpus is pure
# ASCII, so DuckDB string-side oracles verify binary-side Spark ops)
# --------------------------------------------------------------------

def _media(spark, sf_dir):
    return multimodal.with_media(_t(spark, sf_dir, "documents"))


def _media_catalog(spark, sf_dir):
    return multimodal.media_catalog(_media(spark, sf_dir))


_MEDIA_CATALOG_SQL = """
SELECT doc_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
       CAST(length(text) AS BIGINT) AS byte_len,
       CAST(32 + (doc_id * 7) % 480 AS INTEGER) AS width,
       CAST(32 + (doc_id * 13) % 360 AS INTEGER) AS height,
       CAST([8000,16000,44100][CAST(doc_id % 3 AS INTEGER) + 1] AS INTEGER) AS sample_rate,
       CAST(CEIL(length(text) / 64.0) AS BIGINT) AS n_frames,
       md5(text) AS payload_md5
FROM documents
"""


def _media_stats(spark, sf_dir):
    return multimodal.media_type_stats(_media(spark, sf_dir))


_MEDIA_STATS_SQL = """
SELECT ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
       CAST(count(*) AS BIGINT) AS item_count,
       CAST(sum(length(text)) AS BIGINT) AS total_bytes,
       CAST(min(length(text)) AS BIGINT) AS min_bytes,
       CAST(max(length(text)) AS BIGINT) AS max_bytes,
       CAST(sum(CAST(CEIL(length(text) / 64.0) AS BIGINT)) AS BIGINT) AS total_frames
FROM documents
GROUP BY media_type
"""


def _media_frames(spark, sf_dir):
    return multimodal.frame_sample(_media(spark, sf_dir))


_MEDIA_FRAMES_SQL = """
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(CEIL(length(text) / 64.0) AS BIGINT), 4)) AS fi
  FROM documents
)
SELECT doc_id,
       CAST(fi AS BIGINT) AS frame_idx,
       CAST(length(substring(text, CAST(fi * 64 + 1 AS BIGINT), 64)) AS BIGINT) AS frame_len,
       md5(substring(text, CAST(fi * 64 + 1 AS BIGINT), 64)) AS frame_md5
FROM f
"""


def _media_hist(spark, sf_dir):
    return multimodal.byte_histogram(_media(spark, sf_dir))


_MEDIA_HIST_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
)
SELECT doc_id,
       CAST(unicode(ch) // 32 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS byte_count
FROM chars
GROUP BY doc_id, bucket
"""


def _media_features(spark, sf_dir):
    feats = multimodal.decode_features(_media(spark, sf_dir))
    # arrays are awkward to hash cross-engine → rows-only check; the
    # schema/shape is still asserted by tests/test_multimodal.py
    return feats.select(
        "doc_id", "media_type", F.size("feature").alias("feature_dim")
    )


# --------------------------------------------------------------------
