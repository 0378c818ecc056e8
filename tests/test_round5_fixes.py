"""Round-5 fixes: unconditional fuzzy bag-distance bound, corpus_stats
mid-rewrite empty-read retry, sampling threshold rounding, percolator
multi-term queries (VERDICT r4 next-round items + ADVICE r4)."""

import os
import shutil

import pytest


# --------------------------------- fuzzy: non-ASCII query bypasses prefilter
def test_fuzzy_nonascii_query_not_pruned(index_dir):
    """ADVICE r4: byte-level bag distance over-counts multi-byte QUERY
    chars — 'réturn'~1 vs dictionary term 'return' has char edit distance
    1 but byte bag distance 2, so the prefilter would wrongly prune it.
    Non-ASCII queries must skip the prefilter and still find the term."""
    from lucille_spark.index.reader import IndexReader

    rd = IndexReader(index_dir)
    # sanity: ASCII path still works and prefilters
    got = rd.terms_fuzzy("content", "return", max_edits=1, limit=50)
    assert "return" in got
    assert rd._fuzzy_stats["bag_survivors"] <= rd._fuzzy_stats["banded"]

    got = rd.terms_fuzzy("content", "réturn", max_edits=1, limit=50)
    assert "return" in got, "non-ASCII query wrongly pruned an edit-1 term"
    # prefilter bypassed: every banded candidate reaches the DP
    assert rd._fuzzy_stats["bag_survivors"] == rd._fuzzy_stats["banded"]


# ------------------------- corpus_stats mid-rewrite reads as empty -> retry
def test_reader_rejects_empty_corpus_stats(index_dir, tmp_path):
    """ADVICE r4 (medium): between write_small_parquet's rmtree and the
    atomic rename, corpus_stats exists containing only a dot-prefixed temp
    file — the dataset reads as an EMPTY table. The reader must treat that
    as a retryable mid-rewrite state (and ultimately raise), never
    silently construct with stats == {}."""
    import pyarrow.dataset as ds

    from lucille_spark.index.reader import IndexReader

    idx = str(tmp_path / "idx")
    shutil.copytree(index_dir, idx)
    cs = os.path.join(idx, "corpus_stats")
    tmp_file = None
    for f in os.listdir(cs):
        if not f.startswith((".", "_")):
            tmp_file = os.path.join(cs, "." + f + ".tmp")
            os.rename(os.path.join(cs, f), tmp_file)
    assert tmp_file is not None
    # the dataset API itself happily yields an empty, field-less table
    assert ds.dataset(cs, ignore_prefixes=[".", "_"]).to_table().num_rows == 0

    with pytest.raises(FileNotFoundError):
        IndexReader(idx)

    # once the writer's rename completes, construction succeeds again
    os.rename(tmp_file, os.path.join(cs, os.path.basename(tmp_file)[1:-4]))
    rd = IndexReader(idx)
    assert rd.stats and "content" in rd.stats


# ----------------------------------------- sampling threshold is round()ed
def test_sampling_threshold_rounding(spark):
    """ADVICE r4: int(rate * 10000) truncates float error (0.57 * 10000
    == 5699.999... on this platform), under-sampling by a bucket;
    round() gives the exact threshold an oracle computes."""
    from lucille_spark.ml.sampling import (_BUCKETS, _bucket,
                                           deterministic_sample)

    assert int(0.57 * _BUCKETS) == 5699          # the trap being fixed
    assert round(0.57 * _BUCKETS) == 5700
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    got = deterministic_sample(df, "doc_id", 0.57).count()
    want = df.filter(_bucket("doc_id") < 5700).count()
    assert got == want
    # every 4-decimal rate now yields the exact threshold
    assert all(round((i / 10000) * _BUCKETS) == i for i in range(10001))
    # nested-sample property survives: rate r1 < r2 -> subset
    ids_29 = {r.doc_id for r in
              deterministic_sample(df, "doc_id", 0.29).collect()}
    ids_50 = {r.doc_id for r in
              deterministic_sample(df, "doc_id", 0.50).collect()}
    assert ids_29 <= ids_50


# --------------------------------------- percolator multi-term query nodes
def test_matchquery_multiterm_nodes(spark):
    """ADVICE r4: the parser accepts Prefix/Wildcard/TermRange/Fuzzy but
    MatchQuery raised a bare TypeError at apply time. Doc-level semantics
    ('some token of this doc matches') is one F.exists over the token
    array — implement, don't reject."""
    from lucille_spark.pipeline.stages import MatchQuery

    df = spark.createDataFrame(
        [("1", "test alpha"), ("2", "text beta"), ("3", "toast gamma"),
         ("4", "zulu omega"), ("5", None)],
        "id string, content string")
    st = MatchQuery(queries={
        "wild": "content:te?t",            # test, text
        "pre": "content:t*",               # test, text, toast
        "rng": "content:[alpha TO gamma]", # alpha, beta, gamma
        "rngx": "content:{alpha TO gamma}",  # beta only
        "fz": "content:tost~1",            # toast (ins), test (sub)
        "boolcombo": "content:te?t AND content:beta",
    })
    out = {r.id: set(r.matched_queries) for r in st.apply(df).collect()}
    assert out["1"] == {"wild", "pre", "rng", "fz"}
    assert out["2"] == {"wild", "pre", "rng", "rngx", "boolcombo"}
    assert out["3"] == {"pre", "rng", "fz"}
    assert out["4"] == set()
    assert out["5"] == set()


def test_matchquery_multiterm_agrees_with_oracle(spark):
    """The percolator's doc-level multi-term semantics must equal the
    index plane's expand-then-OR semantics (OracleIndex.match_query)."""
    from lucille_spark.pipeline.stages import MatchQuery
    from lucille_spark.query.oracle import OracleIndex

    rows = [("1", "return value from function"),
            ("2", "returns a tuple"), ("3", "rcturn typo here"),
            ("4", "zebra xylophone"), ("5", "ret retro return")]
    queries = ["content:ret*", "content:return~1", "content:r?turn",
               "content:[ret TO rf]"]
    oi = OracleIndex([{"id": r[0], "content": r[1]} for r in rows],
                     fields=("content",))
    df = spark.createDataFrame(rows, "id string, content string")
    st = MatchQuery(queries={q: q for q in queries})
    hits = {q: set() for q in queries}
    for r in st.apply(df).collect():
        for q in r.matched_queries:
            hits[q].add(r.id)
    for q in queries:
        assert hits[q] == set(oi.match_query(q)), q
