"""FileSource archive/compressed expansion (BaseStorageClient.java:281-330,
FileConnector.java:91 '!' entry separator) + move-after-processing."""

import gzip
import io
import os
import tarfile
import zipfile

import pytest


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "files"
    root.mkdir()
    (root / "plain.txt").write_text("plain file")

    with zipfile.ZipFile(root / "bundle.zip", "w") as zf:
        zf.writestr("a.txt", "zip entry a")
        zf.writestr("sub/b.txt", "zip entry b")
        zf.writestr("skip.bin", "binary skip me")

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"tar entry c"
        info = tarfile.TarInfo("c.txt")
        info.size = len(data)
        info.mtime = 1700000000
        tf.addfile(info, io.BytesIO(data))
    (root / "pack.tar").write_bytes(buf.getvalue())

    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w:gz") as tf:
        data = b"targz entry d"
        info = tarfile.TarInfo("d.txt")
        info.size = len(data)
        info.mtime = 1700000001
        tf.addfile(info, io.BytesIO(data))
    (root / "nested.tar.gz").write_bytes(buf2.getvalue())

    (root / "single.txt.gz").write_bytes(gzip.compress(b"gz single body"))
    return str(root)


def test_archive_and_compressed_expansion(spark, tree):
    from lucille_spark.sources.files import FileSource

    src = FileSource(spark, tree, handle_archived_files=True,
                     handle_compressed_files=True)
    rows = {r["file_path"]: r for r in src.read().collect()}
    by_suffix = {p.split("/")[-1]: r for p, r in rows.items()}

    assert "plain.txt" in by_suffix
    assert bytes(by_suffix["bundle.zip!a.txt"]["content"]) == b"zip entry a"
    assert bytes(rows[[p for p in rows if p.endswith("bundle.zip!sub/b.txt")][0]]
                 ["content"]) == b"zip entry b"
    assert bytes(by_suffix["pack.tar!c.txt"]["content"]) == b"tar entry c"
    assert bytes(by_suffix["nested.tar.gz!d.txt"]["content"]) == b"targz entry d"
    assert bytes(by_suffix["single.txt.gz!single.txt"]["content"]) \
        == b"gz single body"
    # the archive containers themselves are not published as documents
    assert not any(p.endswith("bundle.zip") or p.endswith("pack.tar")
                   for p in rows)
    # sizes reflect the decompressed entries
    assert by_suffix["single.txt.gz!single.txt"]["file_size_bytes"] == 14


def test_entry_include_exclude(spark, tree):
    from lucille_spark.sources.files import FileSource

    src = FileSource(spark, tree, include_regex=r"\.txt$",
                     handle_archived_files=True,
                     handle_compressed_files=True)
    paths = [r["file_path"] for r in src.read().collect()]
    assert any(p.endswith("bundle.zip!a.txt") for p in paths)
    assert not any(p.endswith("skip.bin") for p in paths)


def test_flags_off_archives_stay_opaque(spark, tree):
    from lucille_spark.sources.files import FileSource

    src = FileSource(spark, tree)
    paths = [r["file_path"] for r in src.read().collect()]
    assert any(p.endswith("bundle.zip") for p in paths)
    assert not any("!" in p for p in paths)


def test_move_after_processing(spark, tmp_path):
    from lucille_spark.sources.files import FileSource

    root = tmp_path / "in"
    root.mkdir()
    (root / "x.txt").write_text("x")
    (root / "y.txt").write_text("y")
    dest = str(tmp_path / "done")
    src = FileSource(spark, str(root))
    assert src.read().count() == 2
    assert src.move_after_processing(dest) == 2
    assert sorted(os.listdir(dest)) == ["x.txt", "y.txt"]
    assert os.listdir(root) == []
