"""CLI surface: database→embed→query→verify lifecycle in-process."""

import json

from customkb_spark import cli


def test_cli_lifecycle(spark, tmp_path, capsys):
    d = tmp_path / "texts"
    d.mkdir()
    (d / "a.md").write_text("# Spark\nspark processes data with queries and tables")
    (d / "b.txt").write_text("sorting and merging of windows in batches")
    kb_dir = str(tmp_path / "clikb")

    assert cli.main(["database", kb_dir, "--files", str(d)]) == 0
    out = capsys.readouterr().out
    assert "ingested" in out and "0 chunks" not in out

    assert cli.main(["embed", kb_dir]) == 0
    assert "embedded" in capsys.readouterr().out

    assert cli.main(["query", kb_dir, "spark data query", "--context-only", "--format", "markdown", "--top-k", "3"]) == 0
    ctx = capsys.readouterr().out
    assert "spark" in ctx.lower()

    assert cli.main(["verify", kb_dir]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["chunks"] > 0 and stats["pending_embed"] == 0

    assert cli.main(["optimize", kb_dir]) == 0


def test_cli_database_requires_source(spark, tmp_path, capsys):
    assert cli.main(["database", str(tmp_path / "kbx")]) == 2
