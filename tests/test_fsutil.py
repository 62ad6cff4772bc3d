"""WarehouseFS (Hadoop FileSystem wrapper): direct contract pins.

The artifact cache, compact swap, and streaming sketch publish all ride
these primitives against arbitrary Hadoop stores; each is exercised here
over a ``file://`` URI (same API surface as HDFS/S3A).
"""

from __future__ import annotations

from hoard_spark.fsutil import WarehouseFS


def _uri(p):
    return f"file://{p}"


def test_exists_and_status(spark, tmp_path):
    fs = WarehouseFS(spark)
    f = tmp_path / "a.bin"
    f.write_bytes(b"x" * 123)
    assert fs.exists(_uri(f))
    assert not fs.exists(_uri(tmp_path / "missing"))
    mtime_ms, length = fs.status(_uri(f))
    assert length == 123 and mtime_ms > 0
    assert fs.status(_uri(tmp_path / "missing")) is None


def test_child_summary_counts_direct_children(spark, tmp_path):
    fs = WarehouseFS(spark)
    d = tmp_path / "d"
    d.mkdir()
    (d / "one").write_bytes(b"abc")
    (d / "two").write_bytes(b"defgh")
    sub = d / "sub"
    sub.mkdir()
    (sub / "deep").write_bytes(b"zzzzzzzzz")  # not counted in total
    n, total = fs.child_summary(_uri(d))
    assert n == 3  # two files + the subdir entry
    assert total == 8  # direct files only; dirs report length 0


def test_rename_replaces_existing_tree(spark, tmp_path):
    """os.replace semantics over Hadoop: dst is swapped out, the old
    tree does not survive, no merge-into-dst behavior."""
    fs = WarehouseFS(spark)
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    (src / "new").write_text("new-data")
    dst.mkdir()
    (dst / "old").write_text("old-data")
    fs.rename(_uri(src), _uri(dst))
    assert not src.exists()
    assert (dst / "new").read_text() == "new-data"
    assert not (dst / "old").exists()  # replaced, not merged
    assert not (tmp_path / "dst.__old").exists()  # trash cleaned up


def test_rename_creates_missing_parent(spark, tmp_path):
    fs = WarehouseFS(spark)
    src = tmp_path / "src2"
    src.mkdir()
    (src / "f").write_text("x")
    dst = tmp_path / "deep" / "nested" / "dst"
    fs.rename(_uri(src), _uri(dst))
    assert (dst / "f").read_text() == "x"


def test_rmtree_and_listdir(spark, tmp_path):
    fs = WarehouseFS(spark)
    d = tmp_path / "t"
    d.mkdir()
    (d / "b").write_text("1")
    (d / "a").write_text("2")
    assert fs.listdir(_uri(d)) == ["a", "b"]
    fs.rmtree(_uri(d))
    assert not d.exists()
    assert fs.listdir(_uri(d)) == []  # absent dir lists empty, no raise
    fs.rmtree(_uri(d))  # idempotent


def test_read_bytes_local_and_jvm_paths_agree(spark, tmp_path):
    """read_bytes has two implementations: the local-FS shortcut
    (plain open) and the portable Hadoop stream path (used for
    HDFS/S3). Both must return identical bytes; the JVM path is forced
    by disabling the local resolution."""
    fs = WarehouseFS(spark)
    p = tmp_path / "blob.bin"
    payload = bytes(range(256)) * 17
    p.write_bytes(payload)
    assert fs._local_path(str(p)) is not None  # shortcut engages
    assert fs.read_bytes(str(p)) == payload
    assert fs.read_bytes(_uri(p)) == payload  # file:// form too
    # force the Hadoop stream path
    fs._default_local = False
    assert fs._local_path(str(p)) is None
    assert fs.read_bytes(str(p)) == payload
