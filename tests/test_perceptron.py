"""perceptron_langid: batch-perceptron training-loop invariants."""

from __future__ import annotations

import hashlib

import pytest

from bqetl_spark.caching import release_pinned
from bqetl_spark.functions.text import perceptron_langid

# ids chosen so id % 10 < 3 puts docs 0,1,2,10,11,12 in the training
# slice and leaves 5,6 as held-out
DOCS = [
    (0, "en", "the cat and the dog"),
    (1, "en", "this is the thing and that"),
    (2, "de", "der hund und die katze"),
    (10, "de", "die sonne und der mond"),
    (11, "en", "the sun and the moon"),
    (12, "de", "das wasser und der wind"),
    (5, "en", "the other thing and this"),
    (6, "de", "der wind und das licht"),
]


def _bucket(g: str, buckets: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets


def _python_perceptron(docs, buckets=64, iters=3):
    feats, langs = {}, {}
    for i, lang, text in docs:
        t = text.lower()
        if len(t) < 3:
            continue
        langs[i] = lang
        f = {}
        for p in range(len(t) - 2):
            b = _bucket(t[p:p + 3], buckets)
            f[b] = f.get(b, 0) + 1
        feats[i] = f
    train = {i for i in feats if i % 10 < 3}
    classes = sorted({langs[i] for i in train})
    w = {}

    def score(f, c):
        return sum(n * w.get((c, b), 0) for b, n in f.items())

    def argmax(f):
        return max(classes, key=lambda c: (score(f, c), [-ord(x) for x in c]))

    for _ in range(iters):
        delta = {}
        for i in sorted(train):
            pred = argmax(feats[i])
            if pred != langs[i]:
                for b, n in feats[i].items():
                    delta[(langs[i], b)] = delta.get((langs[i], b), 0) + n
                    delta[(pred, b)] = delta.get((pred, b), 0) - n
        for k, v in delta.items():
            w[k] = w.get(k, 0) + v
    out = {}
    for i, f in feats.items():
        pred = argmax(f)
        out[i] = (langs[i], pred, score(f, pred))
    return out


def test_matches_python_replica(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "lang", "text"])
    got = {r["doc_id"]: (r["lang"], r["pred_lang"], r["score"])
           for r in perceptron_langid(df, buckets=64, iters=3).collect()}
    release_pinned()
    assert got == _python_perceptron(DOCS, buckets=64, iters=3)


def test_learns_separable_training_slice(spark):
    """After 3 batch iterations the training docs themselves must be
    classified correctly (the corpus is linearly separable in trigram
    space: disjoint character sets)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "lang", "text"])
    rows = perceptron_langid(df, buckets=64, iters=3).collect()
    release_pinned()
    train = [r for r in rows if r["doc_id"] % 10 < 3]
    assert train and all(r["pred_lang"] == r["lang"] for r in train)
    # and the held-out German/English docs generalize here too
    held = {r["doc_id"]: r["pred_lang"] for r in rows
            if r["doc_id"] in (5, 6)}
    assert held == {5: "en", 6: "de"}


def test_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "lang", "text"])
    a = sorted(map(tuple,
                   perceptron_langid(df, buckets=64, iters=2).collect()))
    release_pinned()
    b = sorted(map(tuple,
                   perceptron_langid(df.repartition(5), buckets=64,
                                     iters=2).collect()))
    release_pinned()
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "lang", "text"])
    with pytest.raises(ValueError, match="buckets"):
        perceptron_langid(df, buckets=1)
    with pytest.raises(ValueError, match="iters"):
        perceptron_langid(df, iters=0)
    with pytest.raises(ValueError, match="slice"):
        perceptron_langid(df, ref_keep=0)
