"""Adversarial WAND coverage: dense vocabulary (df ~ 0.5-0.9N) makes most
cursors tie on most docs and keeps theta tight — the regime where the
pivot-group/skip-fence bugs live (one was caught at sf0.1 by the gate:
a doc tied across cursors was pruned on a single term's block max).

Randomized query sweep, WAND vs exhaustive vs pure-Python oracle.
"""

import math
import random

import pytest


@pytest.fixture(scope="module")
def dense_index(spark, tmp_path_factory):
    import numpy as np
    import pandas as pd

    from lucille_spark.index.builder import build_index

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(18)]
    rows = []
    for i in range(400):
        n = int(rng.integers(10, 60))
        toks = [vocab[int(x)] for x in
                np.minimum(rng.exponential(4, n).astype(int), 17)]
        rows.append((f"org/r{i % 5}", f"src/f{i}.py", f"c{i // 40}",
                     "python", " ".join(toks)))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                      "content"])
    out = str(tmp_path_factory.mktemp("dense") / "idx")
    build_index(spark.createDataFrame(pdf), out, fields=("content",),
                block_size=16, docs_per_salt=48)
    return out, pdf


@pytest.fixture(scope="module")
def dense_oracle(dense_index):
    import hashlib

    from lucille_spark.query.oracle import OracleIndex

    _, pdf = dense_index
    docs = []
    for _, r in pdf.iterrows():
        doc_id = hashlib.sha256(
            f"{r.repo}\x00{r.path}\x00{r.commit}".encode()).hexdigest()
        docs.append({"id": doc_id, "content": r.content})
    return OracleIndex(docs, fields=("content",))


def _queries():
    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(18)]
    qs = []
    for _ in range(40):
        n = rng.randint(1, 4)
        terms = rng.sample(vocab, n)
        op = rng.choice([" OR ", " AND "])
        qs.append(op.join(f"content:{t}" for t in terms))
    return qs


@pytest.mark.parametrize("k", [1, 3, 10, 50])
def test_dense_rank_identity(dense_index, dense_oracle, k):
    from lucille_spark.query.searcher import IndexSearcher

    searcher = IndexSearcher(dense_index[0])
    for q in _queries():
        got = searcher.search(q, k=k)
        want = dense_oracle.search(q, k=k)
        assert [d for d, _ in got] == [d for d, _ in want], (q, k)
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), (q, k)


def test_strategy_identity_vectorized_vs_wand(dense_index, monkeypatch):
    """r7: search() picks decode-and-score below VEC_POSTINGS_MAX and
    WAND/leapfrog above it — both must return identical ranked hits
    (same docs, bit-equal scores). Force each strategy over the same
    query sweep."""
    import lucille_spark.query.searcher as S

    for q in _queries():
        for k in (1, 10, 50):
            monkeypatch.setattr(S, "VEC_POSTINGS_MAX", 1 << 62)
            vec = S.IndexSearcher(dense_index[0]).search(q, k=k)
            monkeypatch.setattr(S, "VEC_POSTINGS_MAX", 0)
            wand = S.IndexSearcher(dense_index[0]).search(q, k=k)
            assert vec == wand, (q, k)
