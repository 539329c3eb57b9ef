"""Real BPE (functions/bpe.py) + token-level sequence packing
(assemble.pack_sequences) pins — VERDICT r4 'Next round' items #2/#3.

Strategy mirrors the repo's standard: a pure sequential Python reference
implements the TEXTBOOK algorithm (batch merge-all-occurrences BPE,
sequential token-stream cut) and the engine paths must equal it exactly;
scale_safe plans must equal default plans; append must be stable.
"""

import random

import pytest

from delver_spark.functions import bpe


# ---------------------------------------------------------------- train

def test_train_bpe_textbook_example():
    # Sennrich et al. 2016 running example: {low:5, lower:2, newest:6,
    # widest:3}. Most frequent pair is (e,s) 9, then (es,t) 9, then
    # (est,.)-less 'lo' 7... replicate the canonical first merges.
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(wc, 4, min_pair_count=1)
    assert merges[0] == ("e", "s")        # 6+3 = 9
    assert merges[1] == ("es", "t")       # 9
    # next: lo (5+2=7) beats ne/ew/we/est? est pairs: n-e 6, e-w 6,
    # w-e 6+... compute: after est: l-o 7, o-w 7, n-e 6, e-w 6, w-est 6,
    # w-i 3, i-d 3, d-est 3. Tie 7 between (l,o) and (o,w):
    # lexicographic ASC -> (l,o).
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")       # 7


def test_train_bpe_min_pair_count_stops():
    wc = {"ab": 1, "cd": 1}
    assert bpe.train_bpe(wc, 10, min_pair_count=2) == []
    assert len(bpe.train_bpe(wc, 10, min_pair_count=1)) == 2


def _encode_batch_reference(word: str, merges: list) -> list:
    """Textbook batch semantics: per step, find the lowest-rank pair
    present, merge ALL its occurrences left-to-right, repeat."""
    ranks = {p: i for i, p in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        present = {ranks[(a, b)] for a, b in zip(toks, toks[1:])
                   if (a, b) in ranks}
        if not present:
            break
        l, r = merges[min(present)]
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == l and toks[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_encode_equals_batch_reference_fuzz():
    # The docstring's proof, checked empirically: the one-at-a-time
    # leftmost-lowest-rank loop == merge-all-occurrences batch BPE,
    # for REAL (trained) merge tables. 300 random corpora.
    rng = random.Random(42)
    for trial in range(300):
        alpha = "abcd"
        words = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(1, 12)))
                 for _ in range(rng.randint(2, 10))]
        wc = {}
        for w in words:
            wc[w] = wc.get(w, 0) + rng.randint(1, 5)
        merges = bpe.train_bpe(wc, rng.randint(1, 20), min_pair_count=1)
        ranks = bpe.ranks_of(merges)
        for w in list(wc) + ["".join(rng.choice(alpha) for _ in range(8))]:
            assert bpe.encode(w, ranks) == \
                _encode_batch_reference(w, merges), (trial, w, merges)


def test_encode_goldens():
    merges = bpe.demo_merges()
    ranks = bpe.ranks_of(merges)
    # 'the' is the most frequent seed word -> fully merged single token.
    assert bpe.encode("the", ranks) == ["the"]
    # A word with no trained pairs stays characters.
    assert bpe.encode("zq", ranks) == ["z", "q"]
    assert bpe.encode("", ranks) == []
    # Round-trip property: concatenation always reconstructs the word.
    for w in ["partition", "jukebox", "mightier", "xxyyzz"]:
        assert "".join(bpe.encode(w, ranks)) == w


def test_demo_merges_sql_embeddable():
    # merges_values_sql raises on quote/backslash tokens; the demo
    # vocab must embed cleanly (the gate twin depends on it).
    s = bpe.merges_values_sql(bpe.demo_merges())
    assert s.count("(") == len(bpe.demo_merges())


# ------------------------------------------------------- spark encoding

def _seq_token_counts(docs, merges):
    ranks = bpe.ranks_of(merges)
    out = {}
    for doc_id, text in docs:
        if text is None:
            out[doc_id] = (None, None)
            continue
        ws = bpe._WORD_RE.findall(text)
        out[doc_id] = (len(ws), sum(len(bpe.encode(w, ranks)) for w in ws))
    return out


def test_token_counts_spark_equals_sequential(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),
        (3, None),
        (4, "tabs\tand\nnewlines  double  spaces"),
        (5, "unicode nbsp stays one word"),   # NBSP is a word char
        (6, "the the the"),
    ]
    merges = bpe.demo_merges()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe.token_counts(df, merges).collect()}
    assert got == _seq_token_counts(docs, merges)
    assert got[5][0] == 4   # NBSP did NOT split: 4 words, not 5
    assert got[3] == (None, None)
    assert got[2] == (0, 0)


def test_train_bpe_spark_equals_local(spark):
    # \x85 (NEL) and   (LS) pin the Java-vs-Python tokenizer
    # agreement: Java expands \v inside a class to the vertical-
    # whitespace CLASS (would split these), Python/RE2 don't — the
    # pattern must use \x0B so all engines keep them as word chars
    texts = ["the cat sat on the mat", "the bat and the cat",
             "mat bat cat hat", "", "nel\x85stays one word"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    wc = {}
    for t in texts:
        for w in bpe._WORD_RE.findall(t):
            wc[w] = wc.get(w, 0) + 1
    assert bpe.train_bpe_spark(df, 10) == bpe.train_bpe(wc, 10)


# ------------------------------------------------------- pack_sequences

def _seq_pack_reference(rows, context_len):
    """Sequential reference: walk docs in order, accumulate the token
    stream, cut fixed context_len samples."""
    out = {}
    pos = 0
    for order, n in sorted(rows):
        first = pos // context_len
        last = (pos + max(n, 1) - 1) // context_len
        out[order] = (first, last, pos % context_len)
        pos += n
    return out


@pytest.mark.parametrize("scale_safe", [False, True])
def test_pack_sequences_equals_sequential(spark, scale_safe):
    from delver_spark.operators.assemble import pack_sequences
    rng = random.Random(7)
    rows = [(i, rng.choice([0, 1, 3, 17, 250, 256, 257, 1000]))
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(8)
    got = {r["doc_id"]: (r["seq_first"], r["seq_last"], r["offset_in_seq"])
           for r in pack_sequences(df, "n", "doc_id", 256,
                                   scale_safe=scale_safe,
                                   chunk=64).collect()}
    assert got == _seq_pack_reference(rows, 256)


def test_pack_sequences_scale_safe_equal(spark):
    from delver_spark.operators.assemble import pack_sequences
    rng = random.Random(11)
    # Non-contiguous, non-zero-based order keys (gaps stress the
    # DIV-chunk sharding).
    rows = [(i * 37 + rng.randint(0, 30), rng.randint(0, 600))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(8)
    a = sorted(tuple(r) for r in pack_sequences(
        df, "n", "doc_id", 512, scale_safe=False).collect())
    b = sorted(tuple(r) for r in pack_sequences(
        df, "n", "doc_id", 512, scale_safe=True, chunk=100).collect())
    assert a == b


def test_pack_sequences_append_stable(spark):
    from delver_spark.operators.assemble import pack_sequences
    rng = random.Random(13)
    base = [(i, rng.randint(0, 500)) for i in range(200)]
    extra = [(i, rng.randint(0, 500)) for i in range(200, 260)]
    d1 = spark.createDataFrame(base, "doc_id long, n long")
    d2 = spark.createDataFrame(base + extra, "doc_id long, n long")
    r1 = {r["doc_id"]: tuple(r) for r in
          pack_sequences(d1, "n", "doc_id", 128, scale_safe=True).collect()}
    r2 = {r["doc_id"]: tuple(r) for r in
          pack_sequences(d2, "n", "doc_id", 128, scale_safe=True).collect()}
    for k, v in r1.items():
        assert r2[k] == v    # existing rows unchanged by append
