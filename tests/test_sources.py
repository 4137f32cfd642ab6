"""File sources: glob scan metadata, size guard, encoding fallback chain."""

from customkb_spark.sources import files as S


def _write_files(tmp_path):
    (tmp_path / "a.md").write_bytes("# hello utf-8 ✓".encode("utf-8"))
    (tmp_path / "b.txt").write_bytes("café windows".encode("windows-1252"))
    (tmp_path / "big.txt").write_bytes(b"x" * 2048)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.py").write_bytes(b"print('hi')")
    return tmp_path


def test_scan_files_types_and_guard(spark, tmp_path):
    d = _write_files(tmp_path)
    df = S.scan_files(spark, str(d), max_file_size_mb=1e-3)  # 1 KB cap
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert "big.txt" not in rows  # size guard
    assert rows["a.md"]["file_type"] == "markdown"
    assert rows["c.py"]["file_type"] == "code"  # recursive lookup
    assert rows["b.txt"]["length"] == len("café windows".encode("windows-1252"))


def test_decode_fallback_chain(spark, tmp_path):
    d = _write_files(tmp_path)
    out = {
        r["path"].split("/")[-1]: r
        for r in S.read_text_files(spark, str(d)).collect()
    }
    assert out["a.md"]["text"] == "# hello utf-8 ✓"
    assert out["a.md"]["encoding"] == "utf-8"
    # cp1252 bytes are invalid utf-8 → fallback decodes the é correctly
    assert out["b.txt"]["text"] == "café windows"
    assert out["b.txt"]["encoding"] == "windows-1252"


def test_decode_bytes_last_resort():
    # \x81 is undefined in cp1252 → falls through to latin-1 (never fails)
    text, enc = S._decode_bytes(b"\x81 invalid in utf8 \xff and cp1252")
    assert enc == "latin-1" and text is not None
    assert S._decode_bytes(None) == (None, None)


def test_convert_files_to_utf8(spark, tmp_path):
    d = tmp_path / "conv"
    d.mkdir()
    (d / "ok.txt").write_bytes("already utf-8 ✓".encode("utf-8"))
    (d / "legacy.txt").write_bytes("café legacy".encode("windows-1252"))
    report = {
        r["path"].split("/")[-1]: r
        for r in S.convert_files_to_utf8(spark, str(d), dry_run=False).collect()
    }
    assert report["legacy.txt"]["converted"] is True
    assert report["ok.txt"]["converted"] is False
    # file rewritten as utf-8, backup kept
    assert (d / "legacy.txt").read_text(encoding="utf-8") == "café legacy"
    assert (d / "legacy.txt.bak").exists()
