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


def test_suggest_tuning_tiers():
    from customkb_spark.plans.maintenance import suggest_tuning

    low = suggest_tuning(8)
    high = suggest_tuning(256)
    assert low["tier"] == "low" and high["tier"] == "very_high"
    assert suggest_tuning(32)["tier"] == "medium"
    assert suggest_tuning(100)["tier"] == "high"
    # more memory -> larger batches, bigger broadcast threshold
    assert (
        high["kb_config"]["embedding_batch_size"]
        > low["kb_config"]["embedding_batch_size"]
    )
    assert int(high["spark_conf"]["spark.sql.autoBroadcastJoinThreshold"]) > int(
        low["spark_conf"]["spark.sql.autoBroadcastJoinThreshold"]
    )
    assert low["spark_conf"]["spark.sql.adaptive.enabled"] == "true"


def test_cli_curate(spark, tmp_path, capsys):
    out = str(tmp_path / "report")
    rc = cli.main([
        "curate", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--benchmark", "/root/testdata/sf0.001/documents.parquet",
        "--ngram", "5",
    ])
    assert rc == 0
    import json as _json

    summary = _json.loads(capsys.readouterr().out)
    assert summary["docs"] == spark.read.parquet(out).count() > 0
    # benchmark == corpus → everything with >= 5 tokens is contaminated
    assert summary["contaminated_docs"] > 0
    cols = set(spark.read.parquet(out).columns)
    assert {"dup_word_frac", "top_ngram_frac", "dup_span_frac", "n_email", "contaminated"} <= cols
