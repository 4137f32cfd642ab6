"""A7 schema migrations (plans/migrations.py, reference
database/migrations.py): append-only event log, MAX-version aggregate
excluding rollbacks, idempotent BM25 column migration."""

from __future__ import annotations

from customkb_spark.plans import migrations as MG


def test_version_zero_when_untracked(spark, tmp_path):
    assert MG.get_current_schema_version(spark, str(tmp_path / "kb")) == 0


def test_record_and_aggregate_versions(spark, tmp_path):
    kb_dir = str(tmp_path / "kb")
    MG.record_migration(spark, kb_dir, 1, "bm25_columns", now=100.0)
    assert MG.get_current_schema_version(spark, kb_dir) == 1
    MG.record_migration(spark, kb_dir, 2, "categories", now=200.0)
    assert MG.get_current_schema_version(spark, kb_dir) == 2
    # rollback of v2 drops the current version back to 1
    MG.record_rollback(spark, kb_dir, 2, now=300.0)
    assert MG.get_current_schema_version(spark, kb_dir) == 1
    # re-apply after rollback of the SAME version: a newer applied
    # event postdating the rollback counts as applied again (ADVICE r4
    # — the reference's in-place row clears rollback_at on re-apply;
    # the append-only log compares max timestamps instead)
    MG.record_migration(spark, kb_dir, 2, "categories", now=350.0)
    assert MG.get_current_schema_version(spark, kb_dir) == 2
    # ...and a second rollback postdating the re-apply voids it again
    MG.record_rollback(spark, kb_dir, 2, now=360.0)
    assert MG.get_current_schema_version(spark, kb_dir) == 1
    MG.record_migration(spark, kb_dir, 3, "categories-v2", now=400.0)
    assert MG.get_current_schema_version(spark, kb_dir) == 3


def test_migrate_for_bm25_idempotent(spark, tmp_path):
    from customkb_spark.config import KBConfig
    from customkb_spark.kb import KnowledgeBase

    kb_dir = str(tmp_path / "kb")
    docs = spark.createDataFrame(
        [(i, f"spark data state-of-the-art document {i} " * 5, f"/d/{i}.md") for i in range(4)],
        ["doc_id", "text", "source"],
    )
    kb = KnowledgeBase(spark, kb_dir, KBConfig(vector_dimensions=8))
    kb.database(docs)
    assert MG.get_current_schema_version(spark, kb_dir) == 0

    # the current engine schema carries the BM25 columns already — the
    # migration is for LEGACY tables, so idempotence short-circuits
    assert MG.migrate_for_bm25(kb) is False
    assert MG.get_current_schema_version(spark, kb_dir) == 0

    # simulate a pre-BM25 legacy table: drop the columns and rewrite
    legacy = kb._read("chunks").drop("bm25_tokens", "doc_length")
    legacy.write.mode("overwrite").parquet(kb._p("chunks") + ".legacy")
    import shutil

    shutil.rmtree(kb._p("chunks"))
    shutil.move(kb._p("chunks") + ".legacy", kb._p("chunks"))
    kb._invalidate()

    assert MG.migrate_for_bm25(kb) is True
    chunks = kb._read("chunks")
    assert "bm25_tokens" in chunks.columns and "doc_length" in chunks.columns
    row = chunks.first()
    assert row.doc_length == len(row.bm25_tokens) > 0
    assert "state-of-the-art" in row.bm25_tokens  # F3 contract survives
    assert MG.get_current_schema_version(spark, kb_dir) == MG.BM25_MIGRATION_VERSION

    # second run: columns exist, no rewrite, no duplicate event
    assert MG.migrate_for_bm25(kb) is False
    assert MG.get_current_schema_version(spark, kb_dir) == MG.BM25_MIGRATION_VERSION

    # the migrated table still serves queries (index builds from text)
    kb.embed()
    assert kb.query("spark data document", context_only=True) != ""


def test_migrate_categories_and_timestamps(spark, tmp_path):
    from customkb_spark.config import KBConfig
    from customkb_spark.kb import KnowledgeBase

    kb_dir = str(tmp_path / "kb2")
    docs = spark.createDataFrame(
        [(i, f"doc {i} text " * 10, f"/d/{i}.md") for i in range(3)],
        ["doc_id", "text", "source"],
    )
    kb = KnowledgeBase(spark, kb_dir, KBConfig(vector_dimensions=8))
    kb.database(docs)

    assert MG.migrate_add_categories(kb) is True
    chunks = kb._read("chunks")
    assert "primary_category" in chunks.columns and "categories" in chunks.columns
    assert chunks.filter(chunks.primary_category.isNull()).count() == chunks.count()
    assert MG.migrate_add_categories(kb) is False  # idempotent

    assert MG.migrate_add_timestamps(kb) is True
    chunks = kb._read("chunks")
    assert "created_at" in chunks.columns and "updated_at" in chunks.columns
    assert chunks.filter(chunks.created_at.isNull()).count() == 0
    assert MG.migrate_add_timestamps(kb) is False  # idempotent

    # version aggregate reflects the applied ladder
    assert MG.get_current_schema_version(spark, kb_dir) == MG.TIMESTAMPS_MIGRATION_VERSION
    assert kb.verify()["schema_version"] == MG.TIMESTAMPS_MIGRATION_VERSION
