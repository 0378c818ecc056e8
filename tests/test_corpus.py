"""Determinism + marker-df checks for the F1 synthetic corpus."""

import numpy as np

from lucille_spark.corpus import corpus_pdf


def test_pure_function_of_index():
    a = corpus_pdf(np.arange(100))
    b = corpus_pdf(np.arange(100))
    assert a.equals(b)


def test_partition_independence():
    whole = corpus_pdf(np.arange(200))
    parts = [corpus_pdf(np.arange(0, 50)), corpus_pdf(np.arange(50, 200))]
    import pandas as pd
    joined = pd.concat(parts, ignore_index=True)
    assert whole.equals(joined)


def test_schema_and_markers():
    pdf = corpus_pdf(np.arange(2000))
    assert list(pdf.columns) == ["repo", "path", "commit", "lang", "content"]
    text = " " + " ".join(pdf["content"]) + " "
    assert " koala " in text  # df=1 marker (doc 37)
    n_test = sum(1 for c in pdf["content"] if " test" in " " + c + " ")
    assert n_test >= 2000 // 50  # planted df
    collide = [c for i, c in enumerate(pdf["content"]) if i % 97 == 5]
    assert all(c.startswith("ident_collide ") for c in collide)
    assert len({len(c.split()) for c in collide}) == 1  # fixed dl → ties


def test_lengths_in_range():
    pdf = corpus_pdf(np.arange(500))
    lens = pdf["content"].str.split().map(len)
    assert lens.min() >= 30
    assert lens.max() <= 604  # 600 + planted markers
