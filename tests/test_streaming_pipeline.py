"""streaming.pipeline — the composed streaming curation pipeline
equals the batch ``curate_pipeline`` on the concatenated corpus
(VERDICT r6 #4), including a mid-chain crash replay.

Corpus design (the chained-gates test's discipline, extended to the
web-clean and budget stages):
- every line has ≥ 4 words and ends in '.', so the C4 battery keeps
  it; no line is mostly-uppercase / numeric / single-word, so
  RefinedWeb keeps it;
- gopher thresholds are loosened to (min_words=5, min_stop_hits=0)
  because the synthetic minhash tokens contain no stopwords; doc 15
  fails on n_words;
- ids ascend in arrival order (stream first-wins == batch min-id);
- the minhash near-dup pair shares only 8-token runs (< k=12) via a
  salt token every 8 positions, so the substring gate upstream cannot
  cut the overlap away — J ≈ 0.56 ≥ 0.5, surfaced by 8×2 banding;
- the semantic dup pair: doc 1 arrives first AND is the
  low-centroid-sim member, so greedy admission == the paper keep
  policy; all non-dup embeddings are ≥ 25° apart (cos < 0.95);
- budget strata are confined to single waves, so the stream's
  arrival-order admission sees each stratum in one micro-batch and
  sorts it by the batch operator's own hash key.
"""

from __future__ import annotations

import math
import string

import numpy as np
import pytest
from pyspark.sql import functions as F

from customkb_spark.plans.pipeline import PipelineConfig, curate_pipeline
from customkb_spark.streaming import pipeline as SP

K, BANDS = 12, 8
PHRASE = "shared run tokens quite long enough to trip the substring gate now"


def _mk_cfg(budgets=None):
    return PipelineConfig(
        c4_clean=True,
        c4_min_words_per_line=4,
        c4_min_sentences=1,
        pii_scrub=True,
        refinedweb_clean=True,
        line_dedup=True,
        exact_dedup=True,
        substring_dedup=True,
        substring_k=K,
        minhash_dedup=True,
        minhash_threshold=0.5,
        minhash_num_hashes=16,
        minhash_bands=BANDS,
        minhash_shingle_n=3,
        semantic_dedup=True,
        # 0.97 (≈14°): non-dup embeddings are spaced ≥ 15° apart
        # (cos 15° = 0.966 < 0.97) — NOTE the batch semantic stage sees
        # every minhash survivor including docs gopher will kill LATER,
        # so even those need safe spacing
        semantic_threshold=0.97,
        gopher_filter=True,
        gopher_min_words=5,
        gopher_min_stop_hits=0,
        decontaminate=True,
        decontaminate_n=4,
        token_budgets=budgets,
        strata_col="source",
        split_weights={"train": 0.5, "validation": 0.25, "test": 0.25},
    )


def _corpus():
    lets = string.ascii_lowercase
    # minhash pair: 27 base tokens; d13 inserts a salt token every 8
    # positions so shared runs stay < K while J stays ≈ 0.56
    d2_toks = ["w" + lets[i // 26] + lets[i % 26] for i in range(27)]
    d2 = "\n".join(
        " ".join(d2_toks[i : i + 9]) + " tokens march onward."
        for i in range(0, 27, 9)
    )
    d13_toks = []
    for i, t in enumerate(d2_toks):
        d13_toks.append(t)
        if (i + 1) % 8 == 0:
            d13_toks.append("ins" + lets[i % 26])
    d13 = "\n".join(
        " ".join(d13_toks[i : i + 10]) + " tokens march onward."
        for i in range(0, len(d13_toks), 10)
    )
    doc1 = (
        "the quick brown fox jumps over the calm river daily.\n"
        "careful readers and their patient friends enjoy every line here.\n"
        "another simple sentence closes the first document neatly."
    )
    doc14 = (
        "totally novel closing words with singular vocabulary entries appear.\n"
        "nothing here repeats any other document lines at all.\n"
        "the final phrasing stays unique and reads quite smoothly."
    )
    waves = [
        [
            (1, doc1, "w1"),
            (2, d2, "w1"),
            # PII: the email must come out as <EMAIL> in both paths
            (3, "contact me at bob@example.com for the details please.\n"
                "the second line carries plain harmless words forward.", "w1"),
            (4, "one two " + PHRASE + " three four and so on.\n"
                "the rest of this document stays entirely original text.", "w1"),
            # decontaminated: contains the benchmark 4-gram
            (5, "the secret benchmark answer phrase sits right here today.\n"
                "every other line of it reads like normal prose.", "w1"),
        ],
        [
            (10, doc1, "w2"),  # exact dup of 1 (line gate empties it)
            (11, "the quick brown fox jumps over the calm river daily.\n"
                 "fresh unshared words arrive with this second wave entry.", "w2"),
            (12, "five six " + PHRASE + " seven eight in order.\n"
                 "the closing line of this page differs from before.", "w2"),
            (13, d13, "w2"),  # minhash near-dup of 2 (J ≈ 0.56)
            (14, doc14, "w2"),  # semantic dup of 1
            (15, "too short for gopher.", "w2"),
        ],
    ]
    # benchmark shares a 4-gram with doc 5 only
    bench = [(100, "the secret benchmark answer phrase is protected.")]

    def v0(deg):
        r = math.radians(deg)
        return [math.cos(r), 0.0, math.sin(r), 0.0]

    def v1(deg):
        r = math.radians(deg)
        return [0.0, math.cos(r), 0.0, math.sin(r)]

    cents = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    # the {1, 14} pair is 2° apart (sim ≈ 0.9994); doc 1 arrives first
    # AND sits at the larger angle (lower centroid sim), so greedy
    # first-wins == the paper's low-centroid-sim keep. Everything else
    # is ≥ 15° from every same-cell neighbor.
    emb = [
        (1, v0(21)), (2, v0(85)), (3, v1(0)), (4, v1(16)), (5, v1(32)),
        (10, v1(80)), (11, v1(48)), (12, v0(45)), (13, v0(64)),
        (14, v0(19)), (15, v1(64)),
    ]
    return waves, bench, emb, cents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_streaming_pipeline_equals_batch(spark, tmp_path):
    waves, bench, emb, cents = _corpus()
    benchmark = spark.createDataFrame(bench, "doc_id long, text string")
    emb_df = spark.createDataFrame(emb, "vec_id long, embedding array<double>")

    # pass 1 (batch, no budget): learn the cleaned token counts so the
    # budget can be set to admit exactly one w2 survivor
    full = _docs(spark, [r for w in waves for r in w])
    kept0, _ = curate_pipeline(
        full, _mk_cfg(), embeddings=emb_df, benchmark=benchmark,
        centroids=cents,
    )
    from customkb_spark.functions import text as X

    tok = {
        r["doc_id"]: r["n"]
        for r in kept0.select(
            "doc_id", F.size(X.tokens("text")).alias("n")
        ).collect()
    }
    w2_ids = sorted(i for i in tok if i >= 10)
    assert w2_ids == [11, 12], f"unexpected w2 survivors {w2_ids}"
    budgets = {
        "w1": sum(n for i, n in tok.items() if i < 10),
        "w2": sum(tok[i] for i in w2_ids) - 1,  # strict prefix drops one
    }

    cfg = _mk_cfg(budgets)
    kept_b, report_b = curate_pipeline(
        full, cfg, embeddings=emb_df, benchmark=benchmark, centroids=cents,
    )
    batch_rows = sorted(
        (r["doc_id"], r["text"], r["source"], r["split"])
        for r in kept_b.collect()
    )

    # streaming twin: two waves through the composed gates
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    runs = None
    for wave in waves:
        _docs(spark, wave).write.mode("append").parquet(src)
        runs = SP.streaming_curate_pipeline(
            spark, src, work, cfg,
            embeddings=emb_df, centroids=cents, benchmark=benchmark,
        )
    stage_names = [r.stage for r in runs]
    assert stage_names == [
        "clean", "line", "exact", "substr", "minhash", "semantic",
        "quality", "budget",
    ]

    final = SP.streaming_pipeline_final(spark, src, work, cfg)
    stream_rows = sorted(
        (r["doc_id"], r["text"], r["source"], r["split"])
        for r in final.collect()
    )
    assert stream_rows == batch_rows
    # the gates really did rewrite: doc 3's address was scrubbed before
    # the substring stage re-tokenized the text (the <EMAIL> marker
    # tokenizes to 'email'; the raw address would have left 'bob')
    doc3 = [r["text"] for r in kept0.collect() if r["doc_id"] == 3]
    assert doc3 and "email" in doc3[0] and "bob" not in doc3[0]

    # attrition card: monotone non-increasing docs, budget row matches
    rep = SP.streaming_pipeline_report(spark, src, work, runs).collect()
    stages = {r["stage"]: r for r in rep}
    assert stages["budget"]["docs_out"] == sum(1 for i, *_ in stream_rows)
    for r in rep:
        if r["stage"] != "semantic":  # id-verdict table, not doc-filtered
            assert r["docs_out"] <= r["docs_in"]

    # crash replay: fresh-checkpoint re-run of the minhash gate over its
    # FULL input history appends nothing (all ids finalized)
    import os

    from customkb_spark.streaming import dedup as SD

    mh_docs = os.path.join(work, "minhash", "docs")
    before = sorted(
        (r["id"], r["text"]) for r in spark.read.parquet(mh_docs).collect()
    )
    substr_docs = os.path.join(work, "substr", "docs")
    s = spark.readStream.schema(
        spark.read.parquet(substr_docs).schema
    ).parquet(substr_docs)
    SD.streaming_minhash_dedup(
        s, os.path.join(work, "minhash"), str(tmp_path / "ck_replay"),
        id_col="doc_id", text_col="clean_text",
        num_hashes=16, bands=BANDS, shingle_n=3, threshold=0.5,
    ).awaitTermination(300)
    after = sorted(
        (r["id"], r["text"]) for r in spark.read.parquet(mh_docs).collect()
    )
    assert after == before


def test_streaming_pipeline_rejects_quality_budget(spark, tmp_path):
    cfg = PipelineConfig(quality_token_budget=1000)
    with pytest.raises(ValueError, match="corpus-global"):
        SP.streaming_curate_pipeline(spark, str(tmp_path), str(tmp_path), cfg)


def test_report_quality_row_monotone_under_semantic(spark, tmp_path):
    """ADVICE r7: the attrition card chains the quality row's docs_in
    from the semantic row, but the quality gate streams from the
    MINHASH output — when semantic removes more docs than quality, the
    naive count made docs_out > docs_in (negative attrition). The card
    must count quality ∩ semantic survivors."""
    import os

    from pyspark.sql import functions as F

    work = str(tmp_path / "wk")
    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [(i, f"text body number {i} alpha beta") for i in range(1, 7)],
        "doc_id long, text string",
    )
    docs.write.parquet(src)
    # hand-built standing dirs: minhash kept everything, semantic kept
    # only ids 1-2, quality (from minhash input) kept 1-5
    os.makedirs(work)
    docs.select(F.col("doc_id").alias("id"), "text").write.parquet(
        f"{work}/minhash/docs"
    )
    spark.createDataFrame([(1,), (2,)], "vec_id long").write.parquet(
        f"{work}/semantic"
    )
    docs.filter(F.col("doc_id") <= 5).select(
        F.col("doc_id").alias("id"), "text"
    ).write.parquet(f"{work}/quality/docs")

    from customkb_spark.streaming import pipeline as SP

    rows = {r["stage"]: r for r in SP.streaming_pipeline_report(
        spark, src, work, id_col="doc_id"
    ).collect()}
    q = rows["quality"]
    sem = rows["semantic"]
    # chained from semantic: docs_in = 2, docs_out = |quality ∩ semantic| = 2
    assert q["docs_in"] == sem["docs_out"] == 2
    assert q["docs_out"] <= q["docs_in"]
    assert q["doc_removed_frac"] >= 0.0
