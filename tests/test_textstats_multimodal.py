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


# ---- from-scratch PNG codec (VERDICT r2 item 8) ---------------------------

def test_png_roundtrip_exact():
    """encode_png → decode_png is bit-exact for 8-bit RGB."""
    import numpy as np

    from cartwright_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 3), (16, 16), (33, 7)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == (h, w, 3)
        assert (out == img).all()


def test_png_all_filter_types_unfilter():
    """The decoder inverts every PNG filter type (1=Sub, 2=Up, 3=Average,
    4=Paeth) — filtered scanlines built by the test, decoded back."""
    import struct
    import zlib

    import numpy as np

    from cartwright_spark.operators.multimodal import _PNG_SIG, decode_png

    rng = np.random.default_rng(11)
    h, w, bpp = 6, 5, 3
    img = rng.integers(0, 256, (h, w, bpp), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    lines = bytearray()
    for y in range(h):
        ftype = [1, 2, 3, 4, 0, 4][y]
        cur = img[y].reshape(-1).astype(int)
        prev = img[y - 1].reshape(-1).astype(int) if y else [0] * (w * bpp)
        lines.append(ftype)
        for x in range(w * bpp):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ftype]
            lines.append((int(cur[x]) - pred) % 256)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xffffffff))
    png = (_PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(lines)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()


def test_png_gray_and_alpha_channels():
    import struct
    import zlib

    import numpy as np

    from cartwright_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xffffffff))

    def build(w, h, color_type, px_bytes):
        return (_PNG_SIG
                + chunk(b"IHDR",
                        struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(px_bytes))
                + chunk(b"IEND", b""))

    # 2x2 grayscale
    g = build(2, 2, 0, b"\x00\x0a\x14" + b"\x00\x1e\x28")
    out = decode_png(g)
    assert out.shape == (2, 2, 3) and (out[0, 0] == 10).all()
    # 1x2 RGBA: alpha dropped
    rgba = build(2, 1, 6, b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 0]))
    out = decode_png(rgba)
    assert out.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_extract_features_real_png_end_to_end(spark):
    """The multimodal feature path runs on REAL PNG bytes (no fake
    decoder): features equal the histogram of the decoded raster."""
    import hashlib

    import numpy as np
    import pandas as pd

    from cartwright_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        extract_features,
    )
    rng = np.random.default_rng(3)
    rows = []
    rasters = {}
    for i in range(24):
        img = rng.integers(0, 256, (8 + i % 3, 6 + i % 4, 3), dtype=np.uint8)
        rasters[i] = img
        rows.append({"media_id": i, "kind": "image",
                     "payload": encode_png(img),
                     "meta": {"mime": "image/png", "width": img.shape[1],
                              "height": img.shape[0], "duration_ms": None}})
    media = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    got = {r["media_id"]: r
           for r in extract_features(media, fake_decode=False).collect()}
    assert len(got) == 24
    for i, img in rasters.items():
        hist, _ = np.histogram(img, bins=16, range=(0, 255))
        want = (hist / hist.sum()).astype(np.float32)
        assert np.allclose(got[i]["feature"], want)
        assert got[i]["payload_sha256"] == hashlib.sha256(
            bytes(encode_png(img))).hexdigest()


def test_repetition_scores_exact(spark):
    """Hand-computed Gopher repetition signals on two tiny docs.

    doc 1 'a b a b a b': 6 word occurrences of 2 distinct words
      -> dup_words = 4; 2-grams: 'a b' x3 + 'b a' x2 (len 3 each)
      -> top2_cov = 9, tot2 = 15; 5-grams: 2 distinct singles (len 9)
      -> dup5 = 0, tot5 = 18; dup_word rule fails (40 > 18) -> keep 0.
    doc 2 'one two three four five six': all distinct
      -> dup_words = 0, tot2 = 7+9+10+9+8 = 43, top2_cov = 10 ('three
      four'), tot5 = 23+23 = 46, dup5 = 0; the top-2-gram rule fails
      (50 > 43 - expected for very short docs) -> keep 0.
    doc 3: empty text -> all zeros, keep 1 (vacuous).
    """
    from cartwright_spark.operators.textstats import repetition_scores

    df = spark.createDataFrame(pd.DataFrame(
        [(1, "a b a b a b"), (2, "one two three four five six"), (3, "")],
        columns=["doc_id", "text"]))
    got = {r["doc_id"]: r.asDict()
           for r in repetition_scores(df).collect()}
    assert got[1] == {"doc_id": 1, "n_words": 6, "dup_words": 4,
                      "top2_cov_chars": 9, "tot2_chars": 15,
                      "dup5_chars": 0, "tot5_chars": 18,
                      "keep_repetition": 0}
    assert got[2] == {"doc_id": 2, "n_words": 6, "dup_words": 0,
                      "top2_cov_chars": 10, "tot2_chars": 43,
                      "dup5_chars": 0, "tot5_chars": 46,
                      "keep_repetition": 0}
    assert got[3] == {"doc_id": 3, "n_words": 0, "dup_words": 0,
                      "top2_cov_chars": 0, "tot2_chars": 0,
                      "dup5_chars": 0, "tot5_chars": 0,
                      "keep_repetition": 1}


def test_repetition_keep_on_clean_long_doc(spark):
    """A long low-repetition doc passes all three Gopher rules; the same
    doc with one phrase repeated 30x fails the top-2-gram and dup-5-gram
    rules."""
    from cartwright_spark.operators.textstats import repetition_scores

    clean = " ".join(f"w{i:03d} v{i:03d}" for i in range(60))
    spam = clean + " buy cheap pills now" * 30
    df = spark.createDataFrame(pd.DataFrame(
        [(1, clean), (2, spam)], columns=["doc_id", "text"]))
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    assert got[1]["keep_repetition"] == 1
    assert got[1]["dup_words"] == 0 and got[1]["dup5_chars"] == 0
    assert got[2]["keep_repetition"] == 0
    assert got[2]["dup5_chars"] > 0


def test_curation_repetition_gate(spark):
    """plans/curation.py opt-in stage 5: a doc that clears dedup +
    quality + language but is one phrase repeated falls to the Gopher
    repetition gate; with the flag off the output is unchanged."""
    from cartwright_spark.plans.curation import curate_documents

    clean = ("the cat and the dog of the house go to market it is "
             + " ".join(f"word{i:03d} extra{i:03d}" for i in range(40)))
    spam = ("the cat and the dog of the house go to market it is "
            + "buy cheap pills now " * 40)
    df = spark.createDataFrame(pd.DataFrame(
        [(1, clean), (2, spam)], columns=["doc_id", "text"]))

    base = {r["doc_id"] for r in curate_documents(df).collect()}
    assert base == {1, 2}        # spam survives the r2-era filters
    gated = {r["doc_id"]
             for r in curate_documents(df, repetition_filter=True).collect()}
    assert gated == {1}          # ...and dies to the repetition gate


# ---------------------------------------------------------------------------
# GIF codec
# ---------------------------------------------------------------------------

def test_gif_roundtrip_multiframe_exact():
    import numpy as np
    from cartwright_spark.operators.gif import decode_gif, encode_gif
    rng = np.random.RandomState(3)
    P = 64
    palette = np.stack([(np.arange(P) * 3) % 256, (np.arange(P) * 5) % 256,
                        (np.arange(P) * 7) % 256], 1).astype(np.uint8)
    frames = [rng.randint(0, P, (24, 17)).astype(np.uint8)
              for _ in range(5)]
    delays = [4, 10, 25, 7, 100]
    out = decode_gif(encode_gif(frames, palette, delays))
    assert len(out) == 5
    for i, (d, rgb) in enumerate(out):
        assert d == delays[i]
        assert np.array_equal(rgb, palette[frames[i]])


def test_gif_lzw_width_growth_and_clears():
    # 200x200 = 40k pixels forces the code width past every bump and at
    # least one mid-stream clear; decode must stay bit-exact
    import numpy as np
    from cartwright_spark.operators.gif import decode_gif, encode_gif
    rng = np.random.RandomState(7)
    P = 64
    palette = rng.randint(0, 256, (P, 3)).astype(np.uint8)
    big = rng.randint(0, P, (200, 200)).astype(np.uint8)
    out = decode_gif(encode_gif([big], palette, [1]))
    assert np.array_equal(out[0][1], palette[big])


def test_gif_one_bit_palette_and_decode_image_dispatch():
    import numpy as np
    from cartwright_spark.operators.gif import decode_gif, encode_gif
    from cartwright_spark.operators.multimodal import decode_image
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    fr = (np.arange(81).reshape(9, 9) % 2).astype(np.uint8)
    payload = encode_gif([fr, 1 - fr], pal2, [3, 6])
    frames = decode_gif(payload)
    assert np.array_equal(frames[0][1], pal2[fr])
    assert np.array_equal(frames[1][1], pal2[1 - fr])
    # decode_image returns the first frame as a still
    assert np.array_equal(decode_image(payload), pal2[fr])


def test_gif_rejects_garbage_and_decodes_interlace():
    import numpy as np
    import pytest as _pytest
    from cartwright_spark.operators.gif import decode_gif, encode_gif
    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    # interlace: store the rows in GIF89a pass order (8k, 8k+4, 4k+2,
    # 2k+1), set the interlace flag, and expect the decoder to undo it
    rng = np.random.RandomState(5)
    # palette bytes < 0x2C so payload.index(0x2C) finds the image
    # descriptor, not a palette byte
    pal = rng.randint(0, 43, (16, 3)).astype(np.uint8)
    fh = 13
    frame = rng.randint(0, 16, (fh, 9)).astype(np.uint8)
    order = np.concatenate([np.arange(0, fh, 8), np.arange(4, fh, 8),
                            np.arange(2, fh, 4), np.arange(1, fh, 2)])
    payload = bytearray(encode_gif([frame[order]], pal, [1]))
    idx = payload.index(0x2C)
    payload[idx + 9] |= 0x40
    out = decode_gif(bytes(payload))
    assert np.array_equal(out[0][1], pal[frame])


def test_gif_transparency_keeps_previous_screen():
    import numpy as np
    from cartwright_spark.operators.gif import decode_gif, encode_gif
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], np.uint8)
    f1 = np.full((6, 6), 1, np.uint8)          # all red
    f2 = np.full((6, 6), 2, np.uint8)          # green...
    f2[:3] = 0                                 # ...top half uses index 0
    payload = bytearray(encode_gif([f1, f2], pal, [5, 5]))
    # mark index 0 transparent in the SECOND frame's GCE:
    # GCE layout: 21 F9 04 <flags> <delay lo> <delay hi> <tindex> 00
    gce2 = payload.index(b"\x21\xF9", payload.index(b"\x21\xF9") + 2)
    payload[gce2 + 3] |= 0x01                  # transparency flag
    payload[gce2 + 6] = 0                      # transparent index = 0
    out = decode_gif(bytes(payload))
    assert np.array_equal(out[0][1], pal[f1])
    # frame 2: top half (transparent idx 0) keeps frame 1's red pixels
    want = pal[f2].copy()
    want[:3] = pal[1]
    assert np.array_equal(out[1][1], want)


# ---------------------------------------------------------------------------
# Char-bigram LM quality scoring (operators/langmodel.py)
# ---------------------------------------------------------------------------

def test_bigram_lm_self_score_exact(spark):
    """Hand-computed add-one model on a 2-doc corpus."""
    import math

    import pandas as pd

    from cartwright_spark.operators.langmodel import bigram_lm_score

    docs = spark.createDataFrame(
        pd.DataFrame([(1, "abab"), (2, "abc")], columns=["doc_id", "text"]))
    # bigrams: doc1 ab,ba,ab ; doc2 ab,bc
    # counts: ab=3 ba=1 bc=1 ; ctx: a=3 b=2 ; V = |{a,b,c}| = 3
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    def q(x):  # decimal(38,12) quantization of the per-bigram term
        from decimal import Decimal, ROUND_HALF_UP
        return Decimal(repr(math.log(x))).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP)
    got = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert got[1]["n_bigrams"] == 3 and got[2]["n_bigrams"] == 2
    exp1 = float(q(p_ab) * 2 + q(p_ba))
    exp2 = float(q(p_ab) + q(p_bc))
    assert abs(got[1]["logprob"] - exp1) < 1e-11
    assert abs(got[2]["logprob"] - exp2) < 1e-11
    assert abs(got[1]["bpc"] - (-exp1 / 3 / math.log(2))) < 1e-9


def test_bigram_lm_short_doc_and_unseen_fallback(spark):
    """0/1-char docs emit no rows (Spark sequence(1,0) is descending —
    the array() short-circuit matters); scoring under a foreign model
    falls back to ln((0+1)/(ctx+V)) for seen contexts, ln(1/V) else."""
    import math

    import pandas as pd

    from cartwright_spark.operators.langmodel import (bigram_lm_score,
                                                      train_bigram_lm)

    train = spark.createDataFrame(
        pd.DataFrame([(1, "abab")], columns=["doc_id", "text"]))
    # model: ab=2 ba=1, ctx a=2 b=1, V=|{a,b}|=2
    model = train_bigram_lm(train)
    score = spark.createDataFrame(
        pd.DataFrame([(10, "x"), (11, ""), (12, "az"), (13, "zz")],
                     columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in
           bigram_lm_score(score, model=model).collect()}
    assert 10 not in got and 11 not in got
    # az: context 'a' seen (ctx=2), bigram unseen -> ln(1/(2+2))
    assert abs(got[12]["logprob"] - math.log(1 / 4)) < 1e-11
    # zz: context unseen -> ln(1/V) = ln(1/2)
    assert abs(got[13]["logprob"] - math.log(1 / 2)) < 1e-11


# -------------------------------------------------- term co-occurrence

def _co_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_term_cooccurrence_hand_counts_and_lift(spark):
    from cartwright_spark.operators.textstats import term_cooccurrence
    texts = ["spark sql engine", "spark sql", "spark engine",
             "engine sql spark", "noise only"]
    out = {(r.term_a, r.term_b): r for r in term_cooccurrence(
        _co_docs(spark, texts), min_df=2, max_df=10,
        min_pair=2).collect()}
    # dfs: spark 4, sql 3, engine 3; pairs: (spark,sql) 3, (engine,spark) 3,
    # (engine,sql) 2
    r = out[("spark", "sql")]
    assert (r.c_ab, r.df_a, r.df_b) == (3, 4, 3)
    assert r.lift == 3.0 * 5.0 / (4.0 * 3.0)
    assert out[("engine", "sql")].c_ab == 2
    assert ("noise", "only") not in out          # df=1 terms gated


def test_term_cooccurrence_in_doc_repeats_count_once(spark):
    from cartwright_spark.operators.textstats import term_cooccurrence
    texts = ["a b a b a b", "b a"]
    out = term_cooccurrence(_co_docs(spark, texts), min_df=1,
                            max_df=10, min_pair=1).collect()
    assert len(out) == 1
    assert (out[0].term_a, out[0].term_b, out[0].c_ab) == ("a", "b", 2)


def test_term_cooccurrence_rarest_cap_is_deterministic(spark):
    """With max_terms_per_doc=2 only the two RAREST terms of each doc
    pair up (ties by term)."""
    from cartwright_spark.operators.textstats import term_cooccurrence
    # common appears in all 3 docs; rare1/rare2 in one each
    texts = ["common rare1 rare2", "common filler", "common filler"]
    out = {(r.term_a, r.term_b): r.c_ab for r in term_cooccurrence(
        _co_docs(spark, texts), min_df=1, max_df=10,
        max_terms_per_doc=2, min_pair=1).collect()}
    # doc0 keeps rare1, rare2 (df=1 < common's 3): pair (rare1, rare2)
    # docs 1-2 keep filler (df=2) + common (df=3): pair (common, filler) x2
    assert out == {("rare1", "rare2"): 1, ("common", "filler"): 2}


def test_term_cooccurrence_single_capped_computation(spark):
    """`capped` is checkpointed, so the doc self-join reads ONE
    materialized table (no re-planned subtree per side): the executed
    plan has zero doc-hash exchanges above the scan — the join reuses
    the checkpoint's window partitioning."""
    from cartwright_spark.operators.textstats import term_cooccurrence
    df = term_cooccurrence(_co_docs(spark, ["a b c", "b c d", "c d e"]),
                           min_df=1, max_df=10, min_pair=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no term exchange and no (doc, term) dedup exchange in the final
    # plan — the whole vocabulary/dedup subtree ran ONCE at checkpoint
    # time; only the capped table's own doc-join exchanges remain
    import re
    # the (doc, term) dedup exchange and the vocab term exchange are
    # gone from the final plan (they ran once, at checkpoint time) —
    # the only term-keyed exchange left is the final pair rollup's
    assert not re.search(r"Exchange hashpartitioning\(doc#\d+L, term", plan)
    assert not re.search(r"Exchange hashpartitioning\(term#", plan), plan
    assert plan.count("Exchange hashpartitioning(doc") <= 2, plan


def test_term_cooccurrence_guards(spark):
    from cartwright_spark.operators.textstats import term_cooccurrence
    import pytest as _pt
    d = _co_docs(spark, ["a b"])
    with _pt.raises(ValueError):
        term_cooccurrence(d, min_df=3, max_df=2)
    with _pt.raises(ValueError):
        term_cooccurrence(d, max_terms_per_doc=1)


def test_zipf_fit_recovers_exact_power_law(spark):
    """A corpus whose term frequencies are exactly freq = round(1000 *
    rank^-1) must fit slope ~ -1."""
    from cartwright_spark.operators.textstats import zipf_fit
    words = []
    for rank in range(1, 51):
        words += [f"w{rank:03d}"] * max(1, round(1000 / rank))
    # chunk into docs of 97 words so tokenization is exercised
    docs = [("xx", " ".join(words[i:i + 97]))
            for i in range(0, len(words), 97)]
    df = spark.createDataFrame(docs, ["lang", "text"]).repartition(8)
    row = zipf_fit(df, "lang", "text", top_v=50).collect()[0]
    assert row["n_terms"] == 50
    assert abs(row["zipf_slope"] + 1.0) < 0.02, row["zipf_slope"]


def test_zipf_fit_two_stage_rank_equals_single_window(spark):
    """The salted two-stage top-V must select exactly the global
    top-V: compare against a one-window reference on the same counts."""
    from pyspark.sql import Window, functions as F
    from cartwright_spark.operators.textstats import zipf_fit
    import random
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(400)]
    docs = [("yy", " ".join(rng.choices(vocab, k=200))) for _ in range(40)]
    df = spark.createDataFrame(docs, ["lang", "text"])
    out = zipf_fit(df, "lang", "text", top_v=64, salt_buckets=8).collect()[0]

    toks = df.select("lang", F.explode(
        F.filter(F.split(F.lower("text"), r"\s+"),
                 lambda t: t != "")).alias("term"))
    counts = toks.groupBy("lang", "term").count()
    w = Window.partitionBy("lang").orderBy(F.desc("count"), F.asc("term"))
    ref = (counts.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= 64)
           .select(F.log(F.col("rank").cast("double")).alias("x"),
                   F.log(F.col("count").cast("double")).alias("y"))
           .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
                F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx")).collect()[0])
    slope = ((ref["n"] * ref["sxy"] - ref["sx"] * ref["sy"])
             / (ref["n"] * ref["sxx"] - ref["sx"] ** 2))
    assert out["n_terms"] == 64
    assert abs(out["zipf_slope"] - round(slope, 4)) < 1e-9


# ------------------------------------------------------- readability

def test_readability_known_counts(spark):
    from cartwright_spark.operators.textstats import readability
    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, "headline without terminator"),
         (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in readability(docs).collect()}
    r1 = out[1]
    # words: the cat sat the dog ran = 6; sentences = 2;
    # syllables: 1 each = 6
    assert (r1.n_words, r1.n_sents, r1.n_syll) == (6, 2, 6)
    wps, spw = 6 / 2, 6 / 6
    assert abs(r1.flesch_ease - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-9
    assert abs(r1.fk_grade - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-9
    assert out[2].n_sents == 1                       # floored
    r3 = out[3]
    assert (r3.n_words, r3.n_syll) == (0, 0)
    assert r3.flesch_ease is None and r3.fk_grade is None


def test_readability_syllable_heuristic(spark):
    from cartwright_spark.operators.textstats import readability
    docs = spark.createDataFrame(
        [(1, "beautiful rhythm queueing")], "doc_id long, text string")
    r = readability(docs).collect()[0]
    # beautiful: eau+i+u = 3 groups; rhythm: y = 1; queueing: ueuei = 1
    assert r.n_syll == 5 and r.n_words == 3


def test_readability_no_shuffle_plan(spark):
    from cartwright_spark.operators.textstats import readability
    docs = spark.createDataFrame([(1, "x y z.")], "doc_id long, text string")
    plan = readability(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
