"""Distributed BPE training vs hand-computed merges and a pure-python
twin (the same algorithm the committed oracle uses)."""

from __future__ import annotations

from collections import Counter

from cov_tiles_spark.operators.bpe import bpe_train, word_counts


def _python_bpe(texts, n_merges, min_freq=2):
    wc: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    words = {w: (list(w), n) for w, n in wc.items()}
    out = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in words.values():
            for a, b in zip(syms[:-1], syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_freq:
            break
        out.append((left, right, freq))
        merged = left + right
        for w, (syms, n) in words.items():
            res, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = (res, n)
    return out


def test_bpe_hand_case(spark):
    # "aaab" x3 + "ab": pairs aa=6, ab=4 -> merge (a,a); then (aa,a)=3;
    # then (aaa,b)=3 ... deterministic
    docs = spark.createDataFrame(
        [("aaab",)] * 3 + [("ab",)], "text string"
    )
    merges = bpe_train(docs, "text", n_merges=3)
    assert merges[0] == ("a", "a", 6)
    assert merges == _python_bpe(["aaab"] * 3 + ["ab"], 3)


def test_bpe_matches_python_twin(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog met on a mat",
        "x y z q",  # single-char words: no pairs, must not break ANSI
    ] * 5
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(docs, "text", n_merges=20)
    want = _python_bpe(texts, 20)
    assert got == want
    assert len(got) > 10  # real merges happened


def test_bpe_min_freq_early_stop(spark):
    docs = spark.createDataFrame([("ab cd",)], "text string")
    assert bpe_train(docs, "text", n_merges=5, min_freq=2) == []
    assert len(bpe_train(docs, "text", n_merges=5, min_freq=1)) > 0


def test_word_counts(spark):
    docs = spark.createDataFrame([("A a  b",), ("b",)], "text string")
    got = {r.word: r.n for r in word_counts(docs).collect()}
    assert got == {"a": 2, "b": 2}
