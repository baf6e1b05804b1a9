"""Multimodal plumbing: binary payload/metadata schema, Arrow batch
shape through mapInPandas, deterministic fake decode, frame math.
Oracle parity for the SQL-expressible subset runs in
test_oracle_parity.py; these tests pin the Python-side semantics.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from iceberg_diag_spark.operators import multimodal as mm
from iceberg_diag_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.with_media(load_table(spark, SF_DIR, "documents"))


def test_media_schema(media):
    schema = dict(media.dtypes)
    assert isinstance(media.schema["payload"].dataType, BinaryType)
    assert schema["media_type"] == "string"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "byte_len", "width", "height", "sample_rate", "n_frames",
    ]


def test_payload_roundtrip(media, spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    joined = media.join(docs, "doc_id").select(
        "doc_id", "payload", "text", "meta.byte_len"
    )
    for r in joined.take(20):
        assert bytes(r.payload).decode("utf-8") == r.text
        assert r.byte_len == len(r.text)


def test_frame_sample_matches_python(media):
    rows = mm.frame_sample(media, every_k=4).filter(F.col("doc_id") < 5).collect()
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in media.filter(F.col("doc_id") < 5).collect()
    }
    got = {(r.doc_id, r.frame_idx): (r.frame_len, r.frame_md5) for r in rows}
    want = {}
    for doc_id, buf in payloads.items():
        n_frames = (len(buf) + mm.FRAME_BYTES - 1) // mm.FRAME_BYTES
        for fi in range(0, n_frames, 4):
            frame = buf[fi * mm.FRAME_BYTES : (fi + 1) * mm.FRAME_BYTES]
            want[(doc_id, fi)] = (len(frame), hashlib.md5(frame).hexdigest())
    assert got == want


def test_byte_histogram_totals(media):
    hist = mm.byte_histogram(media)
    per_doc = hist.groupBy("doc_id").agg(F.sum("byte_count").alias("n"))
    lens = media.select("doc_id", F.col("meta.byte_len").alias("n"))
    mismatch = per_doc.join(lens, "doc_id").filter(
        per_doc["n"] != lens["n"]
    )
    assert mismatch.count() == 0


def test_decode_features_shape_and_determinism(media):
    f1 = {r.doc_id: r.feature for r in mm.decode_features(media).collect()}
    f2 = {r.doc_id: r.feature for r in mm.decode_features(media).collect()}
    assert f1 == f2  # deterministic across runs
    assert all(len(v) == mm.FEATURE_DIM for v in f1.values())
    # histogram part sums to ~1 (bins cover the full byte domain)
    for v in list(f1.values())[:10]:
        assert abs(sum(v[:-2]) - 1.0) < 1e-6  # 9-decimal rounding per bin


def test_decode_fake_video_shape():
    import numpy as np

    payload = b"x" * 130
    out = mm._decode_media("video", payload, {})
    assert out.shape == (3, mm.FRAME_BYTES)
    assert out[2, 2:].sum() == 0  # zero-padded tail
    img = mm._decode_media("image", payload, {"height": 16, "width": 20})
    assert img.shape == (16, 20)
    audio = mm._decode_media("audio", payload, {})
    assert np.all((audio >= -1) & (audio < 1))
    with pytest.raises(NotImplementedError):
        mm._decode_media("hologram", payload, {})


def test_features_feed_similarity_search(media):
    """Composition: multimodal decode -> feature vectors -> cosine
    top-k — the decoded features are a valid ANN corpus as-is."""
    from iceberg_diag_spark.operators import similarity

    feats = mm.decode_features(media).withColumnRenamed("feature", "embedding")
    queries = feats.filter(F.col("doc_id") < 3)
    topk = similarity.cosine_topk(
        feats, queries, k=3, id_col="doc_id", vec_col="embedding"
    )
    rows = topk.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos_sim))
    assert set(per_q) == {0, 1, 2}
    for qid, lst in per_q.items():
        assert [r[0] for r in sorted(lst)] == [1, 2, 3]
        assert all(-1.0 <= r[2] <= 1.0001 for r in lst)


def test_media_dedup_stats_counts_byte_identical(spark):
    from iceberg_diag_spark.operators import multimodal

    docs = spark.createDataFrame(
        [
            (0, "same payload bytes"),   # image (0 % 3)
            (3, "same payload bytes"),   # image — byte-identical dup
            (6, "different payload"),    # image
            (1, "audio payload"),        # audio
        ],
        "doc_id long, text string",
    )
    media = multimodal.with_media(docs)
    out = {
        r.media_type: r for r in multimodal.media_dedup_stats(media).collect()
    }
    img = out["image"]
    assert img.n_assets == 3
    assert img.distinct_assets == 2
    assert img.dup_assets == 1
    assert img.reclaimable_bytes == len("same payload bytes")
    assert out["audio"].dup_assets == 0


def test_frame_dedup_finds_shared_intro(spark):
    """Two 'videos' sharing a 64-byte intro frame surface as one
    duplicated frame hash; unique frames don't."""
    from iceberg_diag_spark.operators.multimodal import FRAME_BYTES, frame_dedup

    intro = b"L" * FRAME_BYTES
    rows = [
        (1, "video", intro + b"A" * FRAME_BYTES),
        (2, "video", intro + b"B" * FRAME_BYTES),
        (3, "video", b"C" * FRAME_BYTES),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    ).selectExpr(
        "doc_id", "media_type", "payload",
        "named_struct('byte_len', cast(length(payload) as long), 'width', 0,"
        " 'height', 0, 'sample_rate', 0, 'n_frames', cast(2 as int)) as meta",
    )
    out = frame_dedup(media).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_items"] == 2 and r["n_occurrences"] == 2
    assert r["frame_len"] == FRAME_BYTES
    assert r["example_doc_id"] == 1
    assert r["wasted_bytes"] == FRAME_BYTES
