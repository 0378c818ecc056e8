"""Tests for the second wave of stage/source parity items."""


def test_normalize_field_names(spark):
    from lucille_spark.pipeline.stages import NormalizeFieldNames

    df = spark.createDataFrame([(1, 2, 3)], ["my field", "Weird-Name!", "ok"])
    out = NormalizeFieldNames().apply(df)
    assert out.columns == ["my_field", "Weird_Name", "ok"]


def test_create_children_stage(spark):
    from lucille_spark.pipeline.stages import (
        CreateChildrenStage, EmitNestedChildren,
    )

    df = spark.createDataFrame([("p1",)], "id string")
    chunked = CreateChildrenStage(num_children=3).apply(df)
    kids = EmitNestedChildren(drop_parents=True).apply(chunked)
    assert sorted(r["id"] for r in kids.collect()) == [
        "p1-child1", "p1-child2", "p1-child3"]


def test_python_udf_stage(spark):
    from lucille_spark.pipeline.stages import PythonUDF

    def fn(pdf):
        pdf = pdf.copy()
        pdf["double"] = pdf["n"] * 2
        return pdf[["id", "double"]]

    df = spark.createDataFrame([("a", 3), ("b", 4)], "id string, n int")
    out = PythonUDF(fn=fn, schema="id string, double int").apply(df)
    assert {(r["id"], r["double"]) for r in out.collect()} == {
        ("a", 6), ("b", 8)}


def test_apply_html(spark):
    from lucille_spark.pipeline.stages import ApplyHTML

    html = ('<html><head><title>My Page</title></head><body>'
            '<div class="main">Hello <b>World</b></div>'
            '<div class="side">ignore</div></body></html>')
    df = spark.createDataFrame([("d1", html)], "id string, html string")
    out = ApplyHTML(source="html", mapping={
        "title": "title", "body_text": "div.main"}).apply(df).collect()[0]
    assert out["title"] == "My Page"
    assert out["body_text"] == "Hello World"


def test_read_xml_docs(spark, tmp_path):
    from lucille_spark.sources.xml_source import read_xml_docs

    (tmp_path / "cat.xml").write_text(
        "<catalog>"
        "<book><isbn>111</isbn><t>First</t></book>"
        "<book><isbn>222</isbn><t>Second</t></book>"
        "</catalog>")
    df = read_xml_docs(spark, str(tmp_path), row_xpath="/catalog/book",
                       id_xpath="/catalog/book/isbn/text()",
                       field_xpaths={"title": "/catalog/book/t/text()"})
    rows = {r["id"]: r["title"] for r in df.collect()}
    assert rows == {"111": "First", "222": "Second"}


def test_code_analyzer_tokens(spark):
    from pyspark.sql import functions as F

    from lucille_spark.analysis.analyzers import (
        tokenize_code_col, tokenize_code_py,
    )

    df = spark.createDataFrame(
        [("def getUserName(self): return user_name",)], "content string")
    got = df.select(tokenize_code_col(F.col("content")).alias("t")
                    ).collect()[0]["t"]
    want = tokenize_code_py("def getUserName(self): return user_name")
    assert got == want
    assert "getusername" in got and "user" in got and "name" in got


def test_code_analyzer_index_search(spark, tmp_path):
    from lucille_spark.index.builder import build_index
    from lucille_spark.query.searcher import IndexSearcher

    rows = [("o/r", f"f{i}.py", "c0", "python",
             "class DataLoader: def loadBatch(self): pass" if i == 0
             else "plain words only here")
            for i in range(20)]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    out = str(tmp_path / "codeidx")
    build_index(corpus, out, fields=("content",), analyzer="code")
    s = IndexSearcher(out)
    # camelCase identifier findable by its sub-token
    hits = s.search("content:loader", k=5)
    assert len(hits) == 1
    # and by the full lowercased identifier
    assert len(s.search("content:dataloader", k=5)) == 1


def test_apply_file_handlers(spark, tmp_path):
    from lucille_spark.pipeline.stages import ApplyFileHandlers

    (tmp_path / "x.csv").write_text("a,b\n1,2\n3,4\n")
    (tmp_path / "y.csv").write_text("a,b\n5,6\n")
    df = spark.createDataFrame(
        [("d1", str(tmp_path / "x.csv")), ("d2", str(tmp_path / "y.csv"))],
        "id string, file_path string")
    out = ApplyFileHandlers(path_field="file_path", handler="csv").apply(df)
    rows = {r["id"]: r["___children"] for r in out.collect()}
    assert len(rows["d1"]) == 2 and len(rows["d2"]) == 1
    assert {c["a"] for c in rows["d1"]} == {"1", "3"}
    assert rows["d1"][0]["id"].startswith("x.csv-")  # handler id synthesis
