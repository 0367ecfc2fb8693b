"""Batch 34 (round 6): distributed BPE merge induction.

The relational trainer is checked against an INDEPENDENT pure-Python
re-implementation of Sennrich's algorithm (greedy left-to-right merge
application, max-count / lexicographic-min-pair selection) on corpora
chosen to exercise the overlap rule (self-adjacent pairs in 'aaaa') and
the '</w>' terminal symbol.
"""

import pytest
from pyspark.sql import functions as F

from dggstools_spark.operators.bpe import EOW, bpe_train


def _ref_bpe(word_freq, rounds):
    """Independent reference: dict word->freq, returns (merges, seqs)."""
    seqs = {w: list(w) + [EOW] for w in word_freq}
    merges = []
    for _ in range(rounds):
        stats = {}
        for w, f in word_freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] = stats.get(
                    (s[i], s[i + 1]), 0) + f
        if not stats:
            raise ValueError("out of pairs")
        c = max(stats.values())
        pair = min(p for p, v in stats.items() if v == c)
        merges.append((pair[0], pair[1], c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def _run(spark, texts, rounds):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    merges, seq = bpe_train(df, "text", rounds)
    got_m = [(r.left, r.right, r.pair_count)
             for r in merges.orderBy("round").collect()]
    got_s = {}
    for r in seq.orderBy("word", "pos").collect():
        got_s.setdefault(r.word, []).append(r.sym)
    return got_m, got_s


def _freqs(texts):
    wf = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


def test_bpe_matches_reference_impl(spark):
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "that hat is the cat hat"]
    rounds = 6
    exp_m, exp_s = _ref_bpe(_freqs(texts), rounds)
    got_m, got_s = _run(spark, texts, rounds)
    assert got_m == exp_m
    assert got_s == exp_s


def test_bpe_overlap_rule_self_adjacent(spark):
    # 'aaaa': run of three (a,a) matches -> greedy merges 1st and 3rd
    got_m, got_s = _run(spark, ["aaaa"], 1)
    assert got_m == [("a", "a", 3)]
    assert got_s["aaaa"] == ["aa", "aa", EOW]
    exp_m, exp_s = _ref_bpe({"aaaa": 1}, 1)
    assert got_m == exp_m and got_s == exp_s


def test_bpe_learns_across_eow_and_case(spark):
    # lowercasing folds 'The' into 'the'; '</w>' merges participate
    texts = ["The the THE the", "b c d e"]
    rounds = 4
    exp_m, exp_s = _ref_bpe(_freqs(texts), rounds)
    got_m, got_s = _run(spark, texts, rounds)
    assert got_m == exp_m and got_s == exp_s
    # after 4 rounds 'the' collapses to a single token
    assert got_s["the"] == ["the" + EOW]


def test_bpe_raises_when_out_of_pairs(spark):
    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    with pytest.raises(ValueError, match="no adjacent pairs"):
        bpe_train(df, "text", 5)


def test_bpe_null_and_empty_tokens_excluded(spark):
    df = spark.createDataFrame(
        [(1, "x  y"), (2, None)], "id long, text string")
    merges, seq = bpe_train(df, "text", 1)
    words = {r.word for r in seq.select("word").distinct().collect()}
    assert words == {"x", "y"}  # no '' word from the double space


def _ref_apply(word_freq, merges):
    """Independent application of learned merges to new words."""
    seqs = {w: list(w) + [EOW] for w in word_freq}
    for l, r, _ in merges:
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == (l, r):
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return seqs


def test_bpe_apply_heldout_matches_reference(spark):
    from dggstools_spark.operators.bpe import bpe_apply

    train = ["the cat sat on the mat", "the cat ate the rat"]
    held = ["that theory chats", "aaaa the"]
    rounds = 5
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "id long, text string")
    merges, _ = bpe_train(df, "text", rounds)
    new_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(held)], "id long, text string")
    seq = bpe_apply(new_df, "text", merges)
    got = {}
    for r in seq.orderBy("word", "pos").collect():
        got.setdefault(r.word, []).append(r.sym)
    exp_m, _ = _ref_bpe(_freqs(train), rounds)
    exp = _ref_apply(_freqs(held), exp_m)
    assert got == exp
    # unseen words decomposed, not dropped
    assert "theory" in got and len(got["theory"]) >= 2
