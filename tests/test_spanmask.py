"""T5-style span corruption — operators/spanmask.py."""
import pytest


def _py_span(doc_id, text, span_len=3, start_mod=20):
    from cartwright_spark.functions.sharding import A, B, C, M
    toks = [w for w in text.split() if w]

    def h(pos):
        k = doc_id % M
        h1 = (k * A + pos * B + C) % M
        return (h1 * h1 + h1) % M

    starts = [1 if h(p) % start_mod == 0 else 0
              for p in range(1, len(toks) + 1)]
    masked = [1 if any(starts[max(0, i - span_len + 1):i + 1])
              else 0 for i in range(len(toks))]
    heads = [1 if masked[i] and (i == 0 or not masked[i - 1]) else 0
             for i in range(len(toks))]
    inp, tgt, run = [], [], 0
    for i, tok in enumerate(toks):
        if heads[i]:
            run += 1
        if not masked[i]:
            inp.append(tok)
        elif heads[i]:
            s = f"<extra_id_{run - 1}>"
            inp.append(s)
            tgt.extend([s, tok])
        else:
            tgt.append(tok)
    return (len(toks), sum(masked), sum(heads),
            " ".join(inp), " ".join(tgt))


def test_span_corruption_python_parity(spark):
    from cartwright_spark.operators.spanmask import span_corruption
    texts = [(i, " ".join(f"w{j}" for j in range(40 + i)))
             for i in range(8)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_masked, r.n_spans,
                      r.input_text, r.target_text)
           for r in span_corruption(docs).collect()}
    for i, t in texts:
        assert got[i] == _py_span(i, t), i


def test_span_corruption_sentinels_consistent(spark):
    from cartwright_spark.operators.spanmask import span_corruption
    docs = spark.createDataFrame(
        [(7, " ".join(f"t{j}" for j in range(300)))],
        "doc_id long, text string")
    r = span_corruption(docs).collect()[0]
    assert r.n_spans >= 1
    # every sentinel in the input appears exactly once in the target
    import re
    inp_s = re.findall(r"<extra_id_\d+>", r.input_text)
    tgt_s = re.findall(r"<extra_id_\d+>", r.target_text)
    assert inp_s == tgt_s == [f"<extra_id_{k}>"
                              for k in range(r.n_spans)]
    # reconstruction: replacing sentinels in input with target spans
    # yields the original token stream
    spans = {}
    cur = None
    for tok in r.target_text.split():
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    rebuilt = []
    for tok in r.input_text.split():
        rebuilt.extend(spans[tok] if tok in spans else [tok])
    assert rebuilt == [f"t{j}" for j in range(300)]
    assert r.n_masked == sum(len(v) for v in spans.values())


def test_span_corruption_empty_and_unmasked_docs(spark):
    from cartwright_spark.operators.spanmask import span_corruption
    docs = spark.createDataFrame([(1, ""), (2, "lone")],
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in span_corruption(docs).collect()}
    assert got[1].n_tokens == 0 and got[1].input_text == ""
    assert got[2].n_tokens == 1
    if got[2].n_masked == 0:
        assert got[2].input_text == "lone" and got[2].target_text == ""


def test_span_corruption_density_near_expected(spark):
    from cartwright_spark.operators.spanmask import span_corruption
    docs = spark.createDataFrame(
        [(i, " ".join(f"x{j}" for j in range(500))) for i in range(20)],
        "doc_id long, text string")
    rows = span_corruption(docs).collect()
    density = sum(r.n_masked for r in rows) / sum(r.n_tokens for r in rows)
    assert 0.08 < density < 0.22     # ~span_len/start_mod = 0.15


def test_span_corruption_validation(spark):
    from cartwright_spark.operators.spanmask import span_corruption
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="span_len"):
        span_corruption(docs, span_len=0)
    with pytest.raises(ValueError, match="start_mod"):
        span_corruption(docs, start_mod=0)
