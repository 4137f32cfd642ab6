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
    # \x81 is undefined in cp1252 → detected/decoded as latin-1
    text, enc, _conf = S._decode_bytes(b"\x81 invalid in utf8 \xff and cp1252")
    assert enc == "latin-1" and text is not None
    assert S._decode_bytes(None) == (None, None, None)


def test_detection_beats_chain_on_utf16_and_boms():
    """Planted fixtures the naive chain MIS-decodes 'successfully':
    BOM-less utf-16 (valid utf-8 as ASCII+NULs!) and BOM'd files."""
    raw16 = "hello bare utf-16 text here".encode("utf-16-le")
    text, enc, conf = S._decode_bytes(raw16)
    assert enc == "utf-16-le" and text == "hello bare utf-16 text here"
    assert conf and conf > 0.5
    text, enc, conf = S._decode_bytes("bom ✓".encode("utf-8-sig"))
    assert (text, enc, conf) == ("bom ✓", "utf-8-sig", 1.0)  # BOM stripped
    text, enc, conf = S._decode_bytes("utf16 bom ✓".encode("utf-16"))
    assert (text, enc) == ("utf16 bom ✓", "utf-16")


def test_detection_c1_scoring_cp1252_vs_latin1():
    # smart quotes/dashes in the C1 range ⇒ cp1252, conf = punct share
    raw = "“smart quotes” – dashes — … café".encode("cp1252")
    text, enc, conf = S._decode_bytes(raw)
    assert enc == "windows-1252" and "“" in text and conf == 1.0
    # cp1252-undefined C1 bytes ⇒ latin-1
    text, enc, conf = S._decode_bytes(b"\x90\x8f odd bytes \xe9")
    assert enc == "latin-1" and conf == 1.0


def test_detection_nonlatin_dense_script():
    # dense high bytes hand off to charset-normalizer (if present):
    # koi8-r russian — the chain would produce cp1252 mojibake
    russian = "Широкая электрификация южных губерний даст мощный толчок подъёму"
    text, enc, conf = S._decode_bytes(russian.encode("koi8-r"))
    try:
        import charset_normalizer  # noqa: F401
    except ImportError:
        assert enc == "windows-1252"  # chain fallback without the lib
    else:
        assert enc == "koi8-r" and text == russian


def test_decoded_confidence_column(spark, tmp_path):
    d = _write_files(tmp_path)
    out = {
        r["path"].split("/")[-1]: r
        for r in S.read_text_files(spark, str(d)).collect()
    }
    assert out["a.md"]["encoding_confidence"] == 1.0  # strict utf-8 proof
    # chain fallback rows carry NULL confidence
    assert out["b.txt"]["encoding_confidence"] is None


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


def test_gpu_conf_plumbing(monkeypatch):
    """spark.task.resource.gpu.amount flows from arg or env into the
    session conf (reference GPU scheduling analogue, gpu_utils.py)."""
    from customkb_spark.session import build_conf

    assert "spark.task.resource.gpu.amount" not in build_conf(32)
    assert build_conf(32, gpus_per_task=0.25)[
        "spark.task.resource.gpu.amount"
    ] == "0.25"
    monkeypatch.setenv("SPARK_GRAFT_GPUS_PER_TASK", "1")
    c = build_conf(8, shuffle_partitions=64)
    assert c["spark.task.resource.gpu.amount"] == "1"
    assert c["spark.sql.shuffle.partitions"] == "64"
