"""Curation pipeline orchestrator — stage composition equals the
operators applied by hand, attrition accounting is consistent, and
toggles skip stages."""

import pytest
from pyspark.sql import functions as F

from customkb_spark.plans.pipeline import PipelineConfig, curate_pipeline

GOOD = (
    "The quick brown fox jumps over the lazy dog near the river bank. "
    "It was a calm and quiet morning in the small town that day. "
    "People walked to the market and bought fresh bread and fruit. "
    "The weather stayed mild and the children played in the park. "
    "Everyone agreed that it was one of the best days of the season. "
    "Later that evening the family gathered for a long dinner together. "
    "They talked about the harvest and the plans for the coming year."
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, GOOD, "src0"),
        (2, GOOD, "src0"),  # exact dup of 1 → dropped at exact_dedup
        (3, GOOD + " A few extra words change this document slightly here.", "src1"),
        (4, "short junk", "src1"),  # fails gopher min_words
        (5, GOOD.replace("quick", "rapid"), "src1"),  # minhash near-dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pipeline_matches_manual_composition(spark, corpus):
    cfg = PipelineConfig(
        c4_clean=False,
        refinedweb_clean=False,
        line_dedup=False,
        substring_dedup=False,
        minhash_threshold=0.5,
        gopher_min_words=20,
    )
    kept, report = curate_pipeline(corpus, cfg)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # 2 exact-dup of 1; 5 (and 3) minhash-near-dup of 1 -> min-id 1
    # survives; 4 fails gopher
    from customkb_spark.operators import dedup as D

    pairs = D.minhash_lsh_duplicates(
        corpus.filter("doc_id != 2"), threshold=0.5
    )
    near_losers = {
        r["id"]
        for r in D.connected_components(pairs).filter("id != cluster_id").collect()
    }
    expect = {1, 3, 5} - near_losers
    assert ids == sorted(expect)
    stages = [r["stage"] for r in report.orderBy("stage_no").collect()]
    assert stages == ["exact_dedup", "minhash_dedup", "gopher_filter"]


def test_pipeline_attrition_accounting(spark, corpus):
    cfg = PipelineConfig(
        c4_clean=False, refinedweb_clean=False, gopher_min_words=20
    )
    kept, report = curate_pipeline(corpus, cfg)
    rows = report.orderBy("stage_no").collect()
    # stage boundaries chain: docs_out of stage i == docs_in of i+1
    for a, b in zip(rows, rows[1:]):
        assert a["docs_out"] == b["docs_in"]
        assert a["tokens_out"] == b["tokens_in"]
    for r in rows:
        assert r["docs_out"] <= r["docs_in"]
        assert 0.0 <= r["doc_removed_frac"] <= 1.0
    assert rows[-1]["docs_out"] == kept.count()


def test_pipeline_stage_toggles_and_splits(spark, corpus):
    cfg = PipelineConfig(
        c4_clean=False,
        refinedweb_clean=False,
        line_dedup=False,
        exact_dedup=True,
        minhash_dedup=False,
        gopher_filter=False,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    kept, report = curate_pipeline(corpus, cfg)
    assert [r["stage"] for r in report.collect()] == ["exact_dedup"]
    assert "split" in kept.columns
    assert kept.filter(F.col("split").isNull()).count() == 0


def test_pipeline_lang_and_pii_stages(spark, corpus):
    rows = corpus.collect()
    extra = [(6, "el gato y el perro en la casa con una mesa y una silla "
                 "que los vecinos en el pueblo usan cada noche para la cena",
              "src1"),
             (7, "Contact me at jane.doe@example.com for the files today "
                 + GOOD, "src0")]
    docs = spark.createDataFrame(
        [tuple(r) for r in rows] + extra,
        "doc_id long, text string, source string",
    )
    cfg = PipelineConfig(
        lang_filter="en",
        pii_scrub=True,
        c4_clean=False,
        refinedweb_clean=False,
        line_dedup=False,
        exact_dedup=False,
        minhash_dedup=False,
        gopher_filter=False,
    )
    kept, report = curate_pipeline(docs, cfg)
    stages = [r["stage"] for r in report.orderBy("stage_no").collect()]
    assert stages == ["lang_filter", "pii_scrub"]
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 6 not in ids and 7 in ids
    red = kept.filter("doc_id = 7").first()["text"]
    assert "<EMAIL>" in red and "jane.doe@example.com" not in red
    # input's own n_chars-style columns survive; stage_seconds recorded
    assert all(r["stage_seconds"] >= 0 for r in report.collect())


def test_pipeline_quality_budget_and_curriculum(spark, corpus):
    cfg = PipelineConfig(
        c4_clean=False,
        refinedweb_clean=False,
        line_dedup=False,
        exact_dedup=False,
        minhash_dedup=False,
        gopher_filter=False,
        quality_token_budget=250,
        curriculum_stages=2,
    )
    kept, report = curate_pipeline(corpus, cfg)
    assert [r["stage"] for r in report.collect()] == ["quality_budget"]
    assert "curriculum_stage" in kept.columns and "corpus_rank" in kept.columns
    stages = {r["curriculum_stage"] for r in kept.collect()}
    assert stages <= {1, 2}
    # budget respected: total kept tokens <= budget
    from customkb_spark.functions import text as XT

    total = kept.agg(F.sum(F.size(XT.tokens("text")))).collect()[0][0]
    assert total <= 250


def test_pipeline_semantic_and_decontaminate_engage(spark, corpus):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    rows = []
    for i in (1, 2, 3, 4, 5):
        # docs 1/3/5 share one embedding direction (semantic dups);
        # 2 and 4 are far away
        v = base if i in (1, 3, 5) else rng.normal(size=8)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(
        [(1, "the weather stayed mild and the children played in the park",)],
        "bid long, text string",
    )
    cfg = PipelineConfig(
        c4_clean=False,
        refinedweb_clean=False,
        line_dedup=False,
        exact_dedup=False,
        minhash_dedup=False,
        gopher_filter=False,
        semantic_nlist=2,
        semantic_threshold=0.99,
        decontaminate_n=8,
    )
    kept, report = curate_pipeline(corpus, cfg, embeddings=emb, benchmark=bench)
    stages = [r["stage"] for r in report.orderBy("stage_no").collect()]
    assert stages == ["semantic_dedup", "decontaminate"]
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # semantic: only one of {1,3,5} survives; decontaminate: the
    # 8-gram planted from GOOD kills any surviving GOOD-derived doc
    assert len(ids & {1, 3, 5}) <= 1
    # every GOOD-derived doc contains the benchmark 8-gram → dropped
    assert ids <= {4}


def test_pipeline_kill_and_resume_completes(spark, corpus, tmp_path):
    """VERDICT r6 #3: a run killed mid-pipeline resumes from its
    durable stage outputs and produces the clean run's exact result.
    The kill is simulated by a materialize hook that dies AFTER
    persisting its stage (the crash window a real job has: write
    committed, driver gone before the next stage)."""
    cfg = PipelineConfig(
        c4_clean=False, refinedweb_clean=False,
        line_dedup=True, exact_dedup=True,
        substring_dedup=True, substring_k=10,
        minhash_dedup=True,
        gopher_min_words=20, gopher_min_stop_hits=2,
    )
    stage_dir = tmp_path / "stages"
    stage_dir.mkdir()

    def materialize(name, df):
        p = str(stage_dir / name)
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    def dying_materialize(name, df):
        out = materialize(name, df)
        if name == "substring_dedup":
            raise RuntimeError("simulated mid-run kill")
        return out

    clean_kept, clean_report = curate_pipeline(
        corpus, cfg, materialize=lambda n, d: d.localCheckpoint()
    )
    clean_rows = sorted(
        (r["doc_id"], r["text"]) for r in clean_kept.collect()
    )
    n_stages = clean_report.count()

    with pytest.raises(RuntimeError, match="simulated"):
        curate_pipeline(corpus, cfg, materialize=dying_materialize)
    done = sorted(p.name for p in stage_dir.iterdir())
    assert done == ["exact_dedup", "line_dedup", "substring_dedup"]

    # resume: finished stages short-circuit (their fns never run), the
    # rest completes, result identical to the clean run
    ran: list[str] = []

    def resume(name):
        import os

        p = str(stage_dir / name)
        if os.path.isdir(p):
            ran.append(name)
            return spark.read.parquet(p)
        return None

    kept, report = curate_pipeline(
        corpus, cfg, materialize=materialize, resume=resume
    )
    assert ran == ["line_dedup", "exact_dedup", "substring_dedup"]
    assert report.count() == n_stages
    assert sorted((r["doc_id"], r["text"]) for r in kept.collect()) == clean_rows
