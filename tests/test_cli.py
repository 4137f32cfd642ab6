"""CLI surface: database→embed→query→verify lifecycle in-process."""

import json

import pytest

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


def test_cli_query_reference_flags(spark, tmp_path, capsys):
    d = tmp_path / "qdocs"
    d.mkdir()
    for i in range(5):
        (d / f"f{i}.txt").write_text(f"spark window table data document {i} " * 8)
    kb_dir = str(tmp_path / "kbq")
    assert cli.main(["database", kb_dir, "--files", str(d)]) == 0
    assert cli.main(["embed", kb_dir]) == 0
    capsys.readouterr()

    qfile = tmp_path / "q.txt"
    qfile.write_text("spark data\n")
    extra = tmp_path / "extra.txt"
    extra.write_text("supplementary note about windows")
    # -Q file question, template + role + context files, stub answer
    rc = cli.main([
        "query", kb_dir,
        "-Q", str(qfile),
        "-p", "scholarly",
        "-R", "You are a terse auditor.",
        "-s", "2",
        "--context-files", str(extra),
        "--context-only",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # context files must actually land in the assembled context
    assert "supplementary note" in out
    # empty question without -Q errors cleanly
    assert cli.main(["query", kb_dir]) == 2
    capsys.readouterr()
    # unreadable -Q / missing context file fail fast with rc 2
    assert cli.main(["query", kb_dir, "-Q", str(tmp_path / "nope.txt")]) == 2
    assert cli.main(["query", kb_dir, "x", "--context-files", "/no/such/file"]) == 2
    capsys.readouterr()


def test_prompt_templates_cover_reference_styles(spark):
    from customkb_spark.plans.answer import PROMPT_TEMPLATES, build_prompt

    expected = {
        "default", "instructive", "scholarly", "concise",
        "analytical", "conversational", "technical",
    }
    assert expected <= set(PROMPT_TEMPLATES)
    for name in expected:
        system, user = build_prompt("q?", "refs", name)
        assert "refs" in user and "q?" in user and system


def test_cli_curate_learned_scorers(spark, tmp_path, capsys):
    out = str(tmp_path / "report_ls")
    rc = cli.main([
        "curate", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--dsir-target", "src0",
        "--quality-ref", "src0",
    ])
    assert rc == 0
    cols = set(spark.read.parquet(out).columns)
    assert {"log_weight", "quality_prob"} <= cols


def test_cli_pack(spark, tmp_path, capsys):
    out = str(tmp_path / "segments")
    rc = cli.main([
        "pack", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--seq-len", "256",
        "--splits", "train=0.9,validation=0.1",
    ])
    assert rc == 0
    import json as _json

    summary = _json.loads(capsys.readouterr().out)
    assert set(summary) <= {"train", "validation"} and "train" in summary
    seg = spark.read.parquet(out)
    # token conservation: segment tokens sum to every doc's token count
    from pyspark.sql import functions as F

    bad = (
        seg.groupBy("doc_id")
        .agg(F.sum("seg_tokens").alias("s"), F.first("n_tokens").alias("n"))
        .filter(F.col("s") != F.col("n"))
    )
    assert bad.count() == 0
    # split isolation: each pack shard carries exactly one split prefix
    assert seg.select("_pack_shard").distinct().filter(
        ~F.col("_pack_shard").rlike("^(train|validation)/")
    ).count() == 0


def test_cli_pack_rejects_bad_splits(spark, tmp_path, capsys):
    args = ["pack", "/root/testdata/sf0.001/documents.parquet"]
    assert cli.main(args + ["--splits", "train=0.9,"]) == 2
    assert "bad --splits" in capsys.readouterr().err
    assert cli.main(args + ["--splits", "train=0.5,validation=0.2"]) == 2
    assert "sum to 1.0" in capsys.readouterr().err


def test_cli_bm25_categorize_edit_version(spark, tmp_path, capsys):
    import json as _json

    d = tmp_path / "docs"
    d.mkdir()
    for i in range(6):
        (d / f"f{i}.txt").write_text(f"spark window data document number {i} " * 8)
    kb_dir = str(tmp_path / "kb9")
    assert cli.main(["database", kb_dir, "--files", str(d)]) == 0
    capsys.readouterr()

    assert cli.main(["bm25", kb_dir]) == 0
    first = _json.loads(capsys.readouterr().out)
    assert first["rebuilt"] is True and first["n_terms"] > 0
    # fresh index → second run skips the build
    assert cli.main(["bm25", kb_dir]) == 0
    assert _json.loads(capsys.readouterr().out)["rebuilt"] is False

    assert cli.main(["categorize", kb_dir]) == 0
    out = capsys.readouterr().out
    assert '"newly_categorized"' in out
    # resume: second run categorizes nothing new
    assert cli.main(["categorize", kb_dir]) == 0
    out2 = capsys.readouterr().out
    assert '"newly_categorized": 0' in out2

    assert cli.main(["edit"]) == 0
    cfg = _json.loads(capsys.readouterr().out)
    assert cfg["effective"]["vector_model"] == "stub-hash-embed"

    assert cli.main(["version"]) == 0
    assert capsys.readouterr().out.strip()


def test_kb_query_uses_persisted_bm25(spark, tmp_path, documents, monkeypatch):
    from customkb_spark.config import KBConfig
    from customkb_spark.kb import KnowledgeBase

    kb = KnowledgeBase(spark, str(tmp_path / "kbp"), KBConfig(query_top_k=5))
    assert kb.database(documents.limit(20)) > 0
    assert kb.embed() > 0
    assert kb.build_bm25()["rebuilt"] is True
    out1 = kb.query("spark data query table", log=False)

    # a fresh session must LOAD the persisted postings, never re-tokenize
    import customkb_spark.plans.hybrid as H

    def _bomb(*a, **k):
        raise AssertionError("postings rebuilt despite persisted index")

    monkeypatch.setattr(H.B, "build_postings", _bomb)
    kb2 = KnowledgeBase(spark, str(tmp_path / "kbp"), KBConfig(query_top_k=5))
    assert kb2.query("spark data query table", log=False) == out1


def test_cli_optimize_reindex_retiers(spark, tmp_path, capsys):
    d = tmp_path / "docs2"
    d.mkdir()
    for i in range(5):
        (d / f"g{i}.txt").write_text(f"window spark table data doc {i} " * 6)
    kb_dir = str(tmp_path / "kbr")
    assert cli.main(["database", kb_dir, "--files", str(d)]) == 0
    assert cli.main(["embed", kb_dir]) == 0
    assert cli.main(["query", kb_dir, "spark data", "--context-only"]) == 0
    import os

    assert os.path.isdir(os.path.join(kb_dir, "vindex"))  # persisted on query
    assert cli.main(["optimize", kb_dir, "--reindex"]) == 0
    assert os.path.isdir(os.path.join(kb_dir, "vindex"))  # rebuilt + re-persisted


def test_cli_reference_flag_parity(spark, tmp_path, capsys):
    """database -l/--detect-language, embed -r, optimize -n/-a/-s/-m."""
    import json as _json
    import os

    d = tmp_path / "fdocs"
    d.mkdir()
    for i in range(4):
        (d / f"f{i}.txt").write_text(f"spark data window table number {i} " * 10)
    kb_dir = str(tmp_path / "kbf")
    assert cli.main(["database", kb_dir, "--files", str(d), "--detect-language", "-l", "en"]) == 0
    assert cli.main(["embed", kb_dir]) == 0
    capsys.readouterr()

    # embed -r drops vectors and re-embeds everything
    n_before = spark.read.parquet(os.path.join(kb_dir, "vectors")).count()
    assert cli.main(["embed", kb_dir, "-r"]) == 0
    out = capsys.readouterr().out
    assert f"embedded {n_before} vectors" in out

    # optimize --show-tiers prints the full tier table without a session
    assert cli.main(["optimize", kb_dir, "--show-tiers"]) == 0
    tiers = _json.loads(capsys.readouterr().out)
    assert set(tiers) == {"low", "medium", "high", "very_high"}

    # optimize --analyze + --memory-gb overrides detection, writes nothing
    chunks_mtime = os.path.getmtime(os.path.join(kb_dir, "chunks"))
    assert cli.main(["optimize", kb_dir, "-a", "-m", "8"]) == 0
    out = capsys.readouterr().out
    assert '"tier": "low"' in out
    assert os.path.getmtime(os.path.join(kb_dir, "chunks")) == chunks_mtime


def test_cli_categorize_sample_fresh_list(spark, tmp_path, capsys):
    import json as _json
    import os

    d = tmp_path / "cdocs"
    d.mkdir()
    for i in range(6):
        (d / f"f{i}.txt").write_text(f"spark window data document number {i} " * 8)
    kb_dir = str(tmp_path / "kbc")
    assert cli.main(["database", kb_dir, "--files", str(d)]) == 0
    capsys.readouterr()

    # -S 2: only two documents categorized
    assert cli.main(["categorize", kb_dir, "-S", "2"]) == 0
    out = capsys.readouterr().out
    assert '"newly_categorized": 2' in out
    # --list shows counts without categorizing more
    assert cli.main(["categorize", kb_dir, "--list"]) == 0
    capsys.readouterr()
    n_after_list = spark.read.parquet(os.path.join(kb_dir, "cat_assignments")).count()
    assert n_after_list == 2
    # --fresh reprocesses everything from scratch
    assert cli.main(["categorize", kb_dir, "--fresh"]) == 0
    out = capsys.readouterr().out
    assert '"newly_categorized": 6' in out


def test_convert_encoding_no_backup(spark, tmp_path):
    from customkb_spark.sources.files import convert_files_to_utf8

    p = tmp_path / "latin.txt"
    p.write_bytes("caf\xe9 cr\xe8me".encode("cp1252"))
    convert_files_to_utf8(spark, str(tmp_path / "*.txt"), dry_run=False, backup_suffix=None)
    assert p.read_text(encoding="utf-8") == "caf\xe9 cr\xe8me"
    assert not (tmp_path / "latin.txt.bak").exists()


def test_language_threads_through_index_query_and_meta(spark, tmp_path):
    """Non-en language keeps stopwords on BOTH sides (postings, avgdl,
    query terms), persists per-KB, and flips bm25_meta freshness."""
    from customkb_spark.config import KBConfig
    from customkb_spark.kb import KnowledgeBase
    from customkb_spark.plans.hybrid import query_terms

    # query tokenization honors the gate
    assert "the" not in query_terms("the spark data", language="en")
    assert "the" in query_terms("the spark data", language="de")

    docs = spark.createDataFrame(
        [(1, "the spark engine and the data tables", "a.txt"),
         (2, "windows of the sorted batches", "b.txt")],
        ["doc_id", "text", "source"],
    )
    kb = KnowledgeBase(spark, str(tmp_path / "kbde"), KBConfig(language="de", query_top_k=5))
    assert kb.database(docs) > 0
    info = kb.build_bm25()
    assert info["rebuilt"] is True
    # stopwords indexed under de
    terms = {r.term for r in spark.read.parquet(str(tmp_path / "kbde" / "postings")).select("term").distinct().collect()}
    assert "the" in terms and "and" in terms
    # switching language invalidates the persisted index
    kb.cfg.language = "en"
    assert kb.build_bm25()["rebuilt"] is True
    terms_en = {r.term for r in spark.read.parquet(str(tmp_path / "kbde" / "postings")).select("term").distinct().collect()}
    assert "the" not in terms_en


def test_cli_language_flag_persists(spark, tmp_path, capsys):
    import os

    d = tmp_path / "ldocs"
    d.mkdir()
    (d / "a.txt").write_text("the spark engine and the data tables " * 5)
    kb_dir = str(tmp_path / "kbl")
    assert cli.main(["database", kb_dir, "--files", str(d), "-l", "de"]) == 0
    assert os.path.exists(os.path.join(kb_dir, "kb.cfg"))
    capsys.readouterr()
    # a LATER process (fresh _kb) picks the language up from kb.cfg
    assert cli.main(["bm25", kb_dir]) == 0
    capsys.readouterr()
    terms = {r.term for r in spark.read.parquet(os.path.join(kb_dir, "postings")).select("term").distinct().collect()}
    assert "the" in terms


def test_embed_reset_keeps_cache_and_restores_on_failure(spark, tmp_path, monkeypatch):
    """embed -r keeps the content-keyed emb_cache (its keys cannot go
    stale) and renames vectors/vindex aside, restoring them when the
    re-embed fails mid-way (ADVICE r3)."""
    import os

    from customkb_spark import cli
    from customkb_spark.kb import KnowledgeBase

    kb_dir = str(tmp_path / "kb")
    docs = tmp_path / "docs"
    docs.mkdir()
    for i in range(3):
        (docs / f"d{i}.md").write_text(f"spark document {i} " * 20)
    assert cli.main(["database", kb_dir, "--files", f"{docs}/*.md"]) == 0
    assert cli.main(["embed", kb_dir]) == 0
    assert os.path.isdir(os.path.join(kb_dir, "vectors"))
    cache_existed = os.path.isdir(os.path.join(kb_dir, "emb_cache"))

    # failure mid-embed: original vectors table must come back
    monkeypatch.setattr(
        KnowledgeBase, "embed", lambda self, **kw: (_ for _ in ()).throw(RuntimeError("quota"))
    )
    with pytest.raises(RuntimeError, match="quota"):
        cli.main(["embed", kb_dir, "-r"])
    assert os.path.isdir(os.path.join(kb_dir, "vectors"))
    assert not os.path.isdir(os.path.join(kb_dir, "vectors.reset-bak"))
    if cache_existed:
        assert os.path.isdir(os.path.join(kb_dir, "emb_cache"))

    monkeypatch.undo()
    # successful reset: backups cleaned up, cache kept
    assert cli.main(["embed", kb_dir, "-r"]) == 0
    assert os.path.isdir(os.path.join(kb_dir, "vectors"))
    assert not os.path.isdir(os.path.join(kb_dir, "vectors.reset-bak"))
    if cache_existed:
        assert os.path.isdir(os.path.join(kb_dir, "emb_cache"))


def test_optimize_clean_cache(spark, tmp_path, capsys):
    """optimize --clean-cache drops NULL/wrong-dimension cache rows
    (reference clean_corrupted_cache.py); --dry-run only reports."""
    from customkb_spark.plans.maintenance import clean_embedding_cache

    kb_dir = str(tmp_path / "kb")
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "d.md").write_text("spark document text " * 20)
    assert cli.main(["database", kb_dir, "--files", f"{docs}/*.md"]) == 0
    assert cli.main(["embed", kb_dir]) == 0

    import os

    cache_path = os.path.join(kb_dir, "emb_cache")
    good = spark.read.parquet(cache_path)
    dims = len(good.first().vector)
    bad = spark.createDataFrame(
        [("badkey1", None), ("badkey2", [0.0] * (dims + 3))], schema=good.schema
    )
    bad.write.mode("append").parquet(cache_path)
    n_total = spark.read.parquet(cache_path).count()

    report = clean_embedding_cache(spark, cache_path, dims, dry_run=True)
    assert report == {"total": n_total, "corrupted": 2, "cleaned": 0}
    assert spark.read.parquet(cache_path).count() == n_total  # untouched

    report = clean_embedding_cache(spark, cache_path, dims)
    assert report["corrupted"] == 2 and report["cleaned"] == 2
    left = spark.read.parquet(cache_path)
    assert left.count() == n_total - 2
    assert left.filter(left.vector.isNull()).count() == 0

    # idempotent + CLI surface
    assert clean_embedding_cache(spark, cache_path, dims)["cleaned"] == 0
    assert cli.main(["optimize", kb_dir, "--clean-cache", "--dry-run"]) == 0
    assert '"corrupted": 0' in capsys.readouterr().out


def test_cli_semdedup(spark, tmp_path, capsys):
    """semdedup over the test embeddings: report written, summary adds
    up, centroid artifact round-trips (second run loads, not retrains)."""
    import json as _json

    out = str(tmp_path / "keep_report")
    cents = str(tmp_path / "cents")
    rc = cli.main([
        "semdedup", "/root/testdata/sf0.001/embeddings.parquet",
        "--out", out, "--centroids", cents,
        "--nlist", "4", "--threshold", "0.35",
    ])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out)
    assert summary["rows"] == summary["kept"] + summary["dropped"]
    assert summary["nlist"] == 4 and summary["rows"] > 0
    from pyspark.sql import functions as F

    rep = spark.read.parquet(out)
    assert {"id", "cluster_id", "centroid_sim", "kept"} <= set(rep.columns)
    assert rep.count() == summary["rows"]
    # artifact persisted and reused: second run on the saved centroids
    # must reproduce the identical keep decision
    import os as _os

    assert _os.path.isdir(cents)
    rc2 = cli.main([
        "semdedup", "/root/testdata/sf0.001/embeddings.parquet",
        "--centroids", cents, "--threshold", "0.35",
    ])
    assert rc2 == 0
    summary2 = _json.loads(capsys.readouterr().out)
    assert summary2["kept"] == summary["kept"]
    # out-of-range threshold finds no pairs: everything kept, clean rc=0
    # (a bad --keep is rejected by argparse choices before cmd_semdedup)
    assert cli.main([
        "semdedup", "/root/testdata/sf0.001/embeddings.parquet",
        "--keep", "low_centroid_sim", "--threshold", "2.0",
    ]) == 0
    summary3 = _json.loads(capsys.readouterr().out)
    assert summary3["dropped"] == 0


def test_cli_semdedup_empty_input(spark, tmp_path, capsys):
    """Zero-row embeddings: sum(kept) aggregates to NULL — the summary
    must print 0s, not crash on int - None (code-review r4)."""
    import json as _json

    src = str(tmp_path / "empty")
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    ).write.parquet(src)
    # pre-trained centroids: an empty corpus can't train its own
    from customkb_spark.embedding.index import train_centroids
    from customkb_spark.embedding.store import save_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents_dir = str(tmp_path / "cents")
    save_centroids(spark, train_centroids(emb, "embedding", nlist=2), cents_dir)
    rc = cli.main(["semdedup", src, "--centroids", cents_dir])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out)
    assert summary["rows"] == 0 and summary["kept"] == 0 and summary["dropped"] == 0


def test_cli_curate_surprisal(spark, tmp_path, capsys):
    """--surprisal adds both LM rungs to the per-doc report and the
    summary; empty docs stay in the report with NULL surprisal."""
    import json as _json

    out = str(tmp_path / "rep")
    rc = cli.main([
        "curate", "/root/testdata/sf0.001/documents.parquet",
        "--out", out, "--surprisal",
    ])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out)
    assert summary["avg_unigram_surprisal"] > 0
    assert summary["avg_bigram_surprisal"] > 0
    rep = spark.read.parquet(out)
    assert {"mean_surprisal", "bigram_surprisal"} <= set(rep.columns)


def test_cli_substr_dedup(spark, tmp_path, capsys):
    import json as _json

    out = str(tmp_path / "ss_clean")
    rc = cli.main([
        "substr-dedup", "/root/testdata/sf0.001/documents.parquet",
        "--k", "8", "--out", out,
    ])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out)
    cleaned = spark.read.parquet(out)
    assert summary["docs"] == cleaned.count() == 500
    assert summary["removed_tokens"] > 0
    assert 0 < summary["removed_frac"] < 1
    assert summary["docs_cut"] >= summary["docs_emptied"]
    # counters consistent with the written table
    row = cleaned.selectExpr(
        "sum(removed_tokens) AS r", "sum(n_tokens) AS t"
    ).collect()[0]
    assert summary["removed_tokens"] == row["r"] and summary["tokens"] == row["t"]


def test_cli_curate_bloom_and_gopher_full(spark, tmp_path, capsys):
    import json as _json

    out = str(tmp_path / "bg_report")
    rc = cli.main([
        "curate", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--benchmark", "/root/testdata/sf0.001/documents.parquet",
        "--ngram", "5", "--bloom", "--gopher-full",
    ])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out)
    # bloom on benchmark==corpus: superset of exact → still everything
    # with >= 5 tokens contaminated
    assert summary["contaminated_docs"] > 400
    cols = set(spark.read.parquet(out).columns)
    assert {"dup_para_char_frac", "top_2_gram_char_frac",
            "dup_10_gram_char_frac", "contaminated"} <= cols


def test_cli_bm25_focused(spark, tmp_path, capsys):
    import json as _json

    d = tmp_path / "fdocs"
    d.mkdir()
    (d / "spark_a.txt").write_text("spark shuffle partition tuning " * 6)
    (d / "spark_b.txt").write_text("spark broadcast join hints " * 6)
    (d / "garden_c.txt").write_text("tomato seedling watering guide " * 6)
    kb_dir = str(tmp_path / "kbcli")
    assert cli.main(["database", kb_dir, "--files", str(d)]) == 0
    capsys.readouterr()
    rc = cli.main(["bm25", kb_dir, "--keyword", "spark", "--name", "focus"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["name"] == "focus" and out["n_chunks"] > 0
    import os

    assert os.path.isdir(os.path.join(kb_dir, "focus_postings"))


def test_cli_doctor(spark, capsys):
    import json as _json

    assert cli.main(["doctor"]) == 0
    report = _json.loads(capsys.readouterr().out)
    assert report["versions"]["pyspark"]
    assert report["session"]["master"].startswith("local")
    assert report["disk"]["free_gb"] > 0
    assert isinstance(report["warnings"], list)


def test_cli_curate_web_clean(spark, tmp_path, capsys):
    out = str(tmp_path / "wc_report")
    rc = cli.main([
        "curate", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--web-clean",
    ])
    assert rc == 0
    capsys.readouterr()
    cols = set(spark.read.parquet(out).columns)
    assert {
        "c4_keep", "c4_sentences", "rw_keep",
        "rw_removed_char_frac", "line_dup_frac",
    } <= cols


def test_cli_bpe_train_encode_fertility(spark, tmp_path, capsys):
    import json as _json

    model = str(tmp_path / "bpe_model")
    docs = "/root/testdata/sf0.001/documents.parquet"
    assert cli.main(["bpe", "train", docs, "--model", model, "--merges", "30"]) == 0
    trained = _json.loads(capsys.readouterr().out)
    assert trained["merges"] == 30 and trained["vocab_words"] > 0

    out = str(tmp_path / "encoded")
    assert cli.main(["bpe", "encode", docs, "--model", model, "--out", out]) == 0
    enc = _json.loads(capsys.readouterr().out)
    assert enc["subwords"] >= enc["words"] > 0
    assert spark.read.parquet(out).count() == enc["docs"]

    assert cli.main(["bpe", "fertility", docs, "--model", model]) == 0
    fert = _json.loads(capsys.readouterr().out)
    assert all(v["fertility"] >= 1.0 for v in fert.values())

    # encode without a trained model: clean error, not a traceback
    assert cli.main(["bpe", "encode", docs, "--model", str(tmp_path / "nope")]) == 2


def test_cli_bpe_algo_wordpiece(spark, tmp_path, capsys):
    """--algo wordpiece trains the third family; encode is
    family-agnostic off the shared seg/ table."""
    import json as _json

    model = str(tmp_path / "wp_model")
    docs = "/root/testdata/sf0.001/documents.parquet"
    assert (
        cli.main(
            ["bpe", "train", docs, "--model", model,
             "--algo", "wordpiece", "--vocab-size", "150"]
        )
        == 0
    )
    trained = _json.loads(capsys.readouterr().out)
    assert trained["algo"] == "wordpiece"
    assert trained["vocab"] <= 150 and trained["vocab_words"] > 0

    assert cli.main(["bpe", "encode", docs, "--model", model]) == 0
    enc = _json.loads(capsys.readouterr().out)
    assert enc["subwords"] >= enc["words"] > 0


def test_cli_pipeline_attrition(spark, tmp_path, capsys):
    """pipeline verb: runs the enabled stages, writes kept + report,
    prints the data-card JSON with chained stage boundaries."""
    import json as _json

    docs = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "kept")
    rc = cli.main([
        "pipeline", docs, "--out", out,
        "--no-c4", "--no-refinedweb", "--no-minhash",
        "--gopher-min-words", "5", "--gopher-min-stop-hits", "0",
        "--splits", "train=0.9,val=0.1",
    ])
    assert rc == 0
    card = _json.loads(capsys.readouterr().out)
    stages = [s["stage"] for s in card["stages"]]
    assert stages == ["line_dedup", "exact_dedup", "gopher_filter"]
    for a, b in zip(card["stages"], card["stages"][1:]):
        assert a["docs_out"] == b["docs_in"]
    kept = spark.read.parquet(out)
    assert kept.count() == card["kept_docs"] > 0
    assert "split" in kept.columns
    report = spark.read.parquet(out + "_report")
    assert report.count() == 3

    # --stage-dir: durable per-stage parquet, same result
    out2 = str(tmp_path / "kept2")
    stage_dir = str(tmp_path / "stages")
    rc = cli.main([
        "pipeline", docs, "--out", out2, "--stage-dir", stage_dir,
        "--no-c4", "--no-refinedweb", "--no-minhash",
        "--gopher-min-words", "5", "--gopher-min-stop-hits", "0",
    ])
    assert rc == 0
    capsys.readouterr()
    import os as _os

    assert sorted(_os.listdir(stage_dir)) == [
        "exact_dedup", "gopher_filter", "line_dedup",
    ]
    kept2 = spark.read.parquet(out2)
    assert kept2.count() == kept.count()

    # --resume: stages with existing parquet are skipped (the stderr
    # marker proves the short-circuit), result unchanged
    out3 = str(tmp_path / "kept3")
    rc = cli.main([
        "pipeline", docs, "--out", out3, "--stage-dir", stage_dir,
        "--resume",
        "--no-c4", "--no-refinedweb", "--no-minhash",
        "--gopher-min-words", "5", "--gopher-min-stop-hits", "0",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert err.count("# pipeline: resuming") == 3
    assert spark.read.parquet(out3).count() == kept.count()

    # --resume without --stage-dir is a usage error, not a silent
    # full re-run (ADVICE r6)
    rc = cli.main(["pipeline", docs, "--out", str(tmp_path / "kept4"), "--resume"])
    assert rc == 2
    assert "--resume requires --stage-dir" in capsys.readouterr().err


def test_cli_pipeline_streaming_twin(spark, tmp_path, capsys):
    """pipeline --streaming: the composed gate chain over the same
    corpus produces the batch verb's corpus (single wave, ascending
    ids → the gates' first-wins == the batch min-id rule)."""
    docs = "/root/testdata/sf0.001/documents.parquet"
    flags = [
        "--no-c4", "--no-refinedweb", "--no-minhash",
        "--gopher-min-words", "5", "--gopher-min-stop-hits", "0",
    ]
    out_b = str(tmp_path / "kept_batch")
    assert cli.main(["pipeline", docs, "--out", out_b] + flags) == 0
    capsys.readouterr()

    # --streaming without --work-dir: usage error
    rc = cli.main(["pipeline", docs, "--out", str(tmp_path / "x"), "--streaming"])
    assert rc == 2
    assert "--streaming requires --work-dir" in capsys.readouterr().err

    out_s = str(tmp_path / "kept_stream")
    rc = cli.main([
        "pipeline", docs, "--out", out_s,
        "--streaming", "--work-dir", str(tmp_path / "work"),
    ] + flags)
    assert rc == 0
    card = json.loads(capsys.readouterr().out)
    assert [s["stage"] for s in card["stages"]] == ["line", "exact", "quality"]
    b = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out_b).select("doc_id", "text").collect()
    )
    s = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out_s).select("doc_id", "text").collect()
    )
    assert s == b == sorted(set(b))
    assert card["kept_docs"] == len(s)


def test_cli_mix_budgets(spark, tmp_path, capsys):
    import json as _json

    docs = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "mixed")
    rc = cli.main(["mix", docs, "--budgets", "src0=500,src1=300", "--out", out])
    assert rc == 0
    got = _json.loads(capsys.readouterr().out)
    assert set(got) <= {"src0", "src1"}
    for s, lim in (("src0", 500), ("src1", 300)):
        if s in got:
            assert got[s]["tokens"] <= lim
    assert cli.main(["mix", docs, "--budgets", "bad"]) == 2


def test_cli_curate_semantic_decontamination(spark, tmp_path, capsys):
    """--semantic-benchmark adds the embedding-cosine tier: corpus
    embeddings vs benchmark embeddings, flag column + best-sim column.
    Benchmark = a slice of the corpus embeddings re-keyed, so those
    exact rows must flag at threshold ~1."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").limit(50).collect()]
    vecs = rng.normal(size=(len(ids), 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb_path = str(tmp_path / "emb")
    bench_path = str(tmp_path / "bench_emb")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "embedding": list(vecs)})
    ).write.parquet(emb_path)
    # benchmark = first 5 corpus vectors (re-keyed): exact leaks
    spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(5)), "embedding": list(vecs[:5])})
    ).write.parquet(bench_path)

    out = str(tmp_path / "report")
    rc = cli.main([
        "curate", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--embeddings", emb_path,
        "--semantic-benchmark", bench_path,
        "--semantic-threshold", "0.99",
    ])
    assert rc == 0
    import json as _json

    summary = _json.loads(capsys.readouterr().out)
    assert summary["semantic_contaminated_docs"] >= 5
    rep = spark.read.parquet(out)
    assert {"semantic_contaminated", "bench_best_sim"} <= set(rep.columns)
    flagged = {r["doc_id"] for r in rep.filter("semantic_contaminated").collect()}
    assert set(ids[:5]) <= flagged
    # docs without an embedding row default to clean, not NULL
    assert rep.filter("semantic_contaminated IS NULL").count() == 0
