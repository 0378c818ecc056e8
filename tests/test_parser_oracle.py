"""Query-parser tests + the reference's MatchQuery boolean-match goldens.

Goldens ported from
/root/reference/lucille-core/src/test/java/com/kmwllc/lucille/stage/MatchQueryTest.java:22-63
with the query set from
/root/reference/lucille-core/src/test/resources/MatchQueryTest/config.conf:14-26
(FIXTURES.md F3).
"""

import math

import pytest

from lucille_spark.analysis import tokenize_py
from lucille_spark.query.oracle import OracleIndex, bm25_components
from lucille_spark.query.parser import (
    And, Not, Or, Phrase, Term, parse, positive_terms,
)


def test_tokenizer_contract():
    assert tokenize_py("The quick  Brown-fox_1!") == ["the", "quick", "brown", "fox_1"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("a_b c") == ["a_b", "c"]


def test_parse_simple():
    assert parse("giraffe") == Term("content", "giraffe")
    assert parse("table:geotrans") == Term("table", "geotrans")
    assert parse("a AND b") == And((Term("content", "a"), Term("content", "b")))
    assert parse("a OR b") == Or((Term("content", "a"), Term("content", "b")))
    assert parse("a b") == Or((Term("content", "a"), Term("content", "b")))
    assert parse("-a") == Not(Term("content", "a"))
    assert parse('content:"import test"') == Phrase("content", ("import", "test"))


def test_parse_nested():
    q = parse("table:geotrans AND -(country:japan OR country:jp)")
    assert isinstance(q, And)
    assert q.children[0] == Term("table", "geotrans")
    assert q.children[1] == Not(
        Or((Term("country", "japan"), Term("country", "jp"))))


def test_positive_terms_excludes_negated():
    q = parse("a AND -b OR c")
    assert positive_terms(q) == [Term("content", "a"), Term("content", "c")]


# --- MatchQuery goldens (reference MatchQueryTest.java:22-63) --------------

DOCS = [
    {"id": "doc1", "content": "giraffe"},
    {"id": "doc2", "content": "giraffe test foo"},
    {"id": "doc3", "content": "test", "table": "geotrans"},
    {"id": "doc4", "content": "foobar"},
    {"id": "doc5", "table": "geotrans", "country": "japan"},
]

QUERIES = {
    # config.conf:20-25 — query1/query2/not_asia/japan
    "query1": "content:giraffe AND content:test",
    "query2": "content:giraffe OR content:test",
    "not_asia": "table:geotrans AND -(country:japan OR country:jp)",
    "japan": "table:geotrans AND country:japan",
}

GOLDEN = {
    "query1": ["doc2"],
    "query2": ["doc1", "doc2", "doc3"],
    "not_asia": ["doc3"],
    "japan": ["doc5"],
}


@pytest.fixture(scope="module")
def idx():
    return OracleIndex(DOCS)


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_matchquery_goldens(idx, qname):
    assert idx.match_query(QUERIES[qname]) == GOLDEN[qname]


def test_phrase_matching(idx):
    assert idx.match_query('content:"giraffe test"') == ["doc2"]
    assert idx.match_query('content:"test giraffe"') == []


def test_bm25_formula():
    # hand-computed: N=5, df=2, tf=1, dl=3, avgdl over 'content' field
    idx = OracleIndex(DOCS)
    avgdl = idx.avgdl["content"]
    expect = bm25_components(tf=1, df=2, dl=3, n_docs=5, avgdl=avgdl)
    got = idx.score_term(Term("content", "giraffe"), 1)
    assert math.isclose(got, expect, rel_tol=1e-12)


def test_bm25_search_order():
    idx = OracleIndex(DOCS)
    res = idx.search("content:giraffe OR content:test", k=10)
    ids = [d for d, _ in res]
    assert set(ids) == {"doc1", "doc2", "doc3"}
    # doc2 matches BOTH terms → accumulates two term scores → ranks first
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    assert ids[0] == "doc2"


def test_rare_term_idf_higher():
    idx = OracleIndex(DOCS)
    assert idx.idf("content", "foobar") > idx.idf("content", "test")
