import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from lucille_spark.session import get_spark

    s = get_spark("lucille-tests", cpus=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus_pdf():
    from lucille_spark.corpus import corpus_pdf

    return corpus_pdf(np.arange(1000))


@pytest.fixture(scope="session")
def index_dir(spark, tmp_path_factory):
    """Index over the 1000-doc F1 corpus, small blocks + forced salting."""
    from lucille_spark.corpus import corpus_df
    from lucille_spark.index.builder import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    corpus = corpus_df(spark, 1000, partitions=7)
    build_index(corpus, out, fields=("content", "lang"), block_size=32,
                docs_per_salt=64)
    return out


@pytest.fixture(scope="session")
def oracle(tiny_corpus_pdf):
    """Pure-Python oracle over the same corpus, same doc ids."""
    import hashlib

    from lucille_spark.query.oracle import OracleIndex

    docs = []
    for _, r in tiny_corpus_pdf.iterrows():
        doc_id = hashlib.sha256(
            f"{r.repo}\x00{r.path}\x00{r.commit}".encode()).hexdigest()
        docs.append({"id": doc_id, "content": r.content, "lang": r.lang})
    return OracleIndex(docs, fields=("content", "lang"))
