"""Text-analysis + multimodal plumbing operators."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cartwright_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample_plan,
    synthetic_media,
)
from cartwright_spark.operators.textstats import (
    detect_language,
    fingerprint,
    quality_scores,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog, and it is fine."),
        (2, "el la de que los gatos duermen en la casa grande"),
        (3, "der die und das ist ein gutes Beispiel für Text"),
        (4, "x"),
        (5, ""),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_token_count(docs):
    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
           for r in token_count(docs).collect()}
    assert got[1][0] == 13
    assert got[4] == (1, 1)
    assert got[5][0] == 0


def test_quality_scores(docs):
    got = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert got[1]["n_punct"] == 2          # comma + period
    assert got[1]["quality_score"] >= 0.6  # decent English sentence
    assert got[5]["n_words"] == 0
    assert got[5]["quality_score"] <= 0.5


def test_detect_language(docs):
    got = {r["doc_id"]: r["lang_detected"]
           for r in detect_language(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "de"


def test_fingerprint_stability(spark):
    rows = [(1, "a b c d e f g h i j k l"), (2, "a b c d e f g h i j k l"),
            (3, "totally different words here now ok yes sure fine")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: (r["fp_min_gram"], r["fp_doc"])
           for r in fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")
    a = decode_image(b"bytes", fake=True)
    assert a.shape == (8, 8, 3) and a.dtype.name == "uint8"
    assert (decode_image(b"bytes", fake=True) == a).all()


def test_extract_features_plumbing(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media, fake_decode=True, feat_dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-5
        assert len(r["payload_sha256"]) == 64
    # determinism
    again = {r["media_id"]: r["payload_sha256"] for r in
             extract_features(media, fake_decode=True).collect()}
    assert again == {r["media_id"]: r["payload_sha256"] for r in rows}


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, 30)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    # only the `video` third of items; 4000-4600ms → 4-5 frames each
    assert all(4 <= r["count"] <= 5 for r in rows)
    assert len(rows) == 10


def test_resize_images_plumbing(spark):
    """Resize: deterministic stub decode → exact area-average downsample →
    raw raster bytes; verified against a direct numpy computation."""
    import hashlib

    import numpy as np

    from cartwright_spark.operators.multimodal import (
        decode_image,
        resize_images,
        synthetic_media,
    )
    media = synthetic_media(spark, 30)
    rows = {r["media_id"]: r for r in
            resize_images(media, width=4, height=4).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()
           if r["kind"] == "image"}
    assert set(rows) == set(src) and len(rows) == 10
    for mid, payload in src.items():
        raster = decode_image(payload, fake=True)
        want = np.empty((4, 4, 3), dtype=np.uint8)
        for i in range(4):
            for j in range(4):
                want[i, j] = raster[2*i:2*i+2, 2*j:2*j+2].mean(
                    axis=(0, 1)).astype(np.uint8)
        got = np.frombuffer(rows[mid]["raster"], dtype=np.uint8).reshape(4, 4, 3)
        assert (got == want).all()
        assert rows[mid]["width"] == 4 and rows[mid]["height"] == 4
