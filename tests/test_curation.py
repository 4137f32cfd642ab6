"""Curation operators: decontamination, PII scrub, repetition signals,
deterministic stratified sampling."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from customkb_spark.operators import curation as C


# ------------------------------------------------------------- ngrams


def test_word_ngrams_basic(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("one",)], ["text"]
    ).select(C.word_ngrams("text", 3).alias("g"))
    rows = [r.g for r in df.collect()]
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == []


def test_word_ngrams_normalizes_case_and_punct(spark):
    df = spark.createDataFrame([("Foo, BAR! baz",)], ["text"]).select(
        C.word_ngrams("text", 2).alias("g")
    )
    assert df.collect()[0].g == ["foo bar", "bar baz"]


# ---------------------------------------------------- decontamination


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
            (3, "short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("quick brown fox jumps over something else entirely",)], ["text"]
    )
    out = {r.doc_id: r for r in C.decontaminate(docs, bench, n=4).collect()}
    assert out[1].contaminated and out[1].contaminated_ngrams >= 1
    assert not out[2].contaminated and out[2].contaminated_ngrams == 0
    # doc shorter than n tokens: 0 ngrams, clean
    assert out[3].total_ngrams == 0 and not out[3].contaminated
    assert len(out) == 3  # every input doc present


def test_decontaminate_counts_distinct_ngrams(spark):
    # same contaminated ngram repeated twice in the doc → counted once
    docs = spark.createDataFrame([(1, "x y x y x y")], ["doc_id", "text"])
    bench = spark.createDataFrame([("x y",)], ["text"])
    row = C.decontaminate(docs, bench, n=2).collect()[0]
    # doc has 'x y' 3× but the benchmark's single bigram matches once
    assert row.contaminated_ngrams == 1
    assert row.total_ngrams == 5


# ------------------------------------------------------------ PII


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.com or call 555-867-5309."),
            (2, "ssn 123-45-6789 from host 10.0.0.1"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.pii_scrub(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "<EMAIL>" in out[1].redacted and "<PHONE>" in out[1].redacted
    assert "jane.doe" not in out[1].redacted and "5309" not in out[1].redacted
    assert out[2].n_ssn == 1 and out[2].n_ipv4 == 1
    assert "<SSN>" in out[2].redacted and "<IPV4>" in out[2].redacted
    assert out[3].redacted == "nothing sensitive here"
    assert out[3].n_email == out[3].n_ssn == out[3].n_phone == out[3].n_ipv4 == 0


def test_pii_ssn_not_eaten_by_phone(spark):
    # ssn redacts first; the phone pattern (3-3-4) must not match 3-2-4
    df = spark.createDataFrame([(1, "id 123-45-6789 ok")], ["doc_id", "text"])
    row = C.pii_scrub(df).collect()[0]
    assert row.n_ssn == 1 and row.n_phone == 0
    assert row.redacted == "id <SSN> ok"


# ------------------------------------------------------- repetition


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "same line\nsame line\nsame line\nother line"),
            (2, "all words distinct here now"),
            (3, "spam spam spam spam"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.repetition_signals(df).collect()}
    assert out[1].n_lines == 4 and out[1].dup_line_frac == 0.5
    assert out[2].dup_line_frac == 0.0 and out[2].dup_word_frac == 0.0
    # 'spam spam' bigram occurs 3 times out of 3 bigrams
    assert out[3].top_gram_cnt == 3 and out[3].total_grams == 3
    assert out[3].top_ngram_frac == 1.0
    assert out[3].dup_word_frac == 0.75


def test_repetition_empty_doc(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    row = C.repetition_signals(df).collect()[0]
    assert row.total_grams == 0 and row.top_ngram_frac == 0.0


# ------------------------------------------------------ span dedup


def test_span_dedup_flags_copies(spark):
    ten = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (1, ten + " k l m"),          # spans: full ten + tail 'k l m'
            (2, ten),                      # exact copy of doc 1's first span
            (3, "totally different words here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.span_dedup_stats(docs, span_words=10).collect()}
    assert out[1].n_spans == 2 and out[1].dup_spans == 0  # first occurrence
    assert out[2].n_spans == 1 and out[2].dup_spans == 1  # copy flagged
    assert out[2].dup_span_frac == 1.0
    assert out[3].dup_spans == 0


def test_span_dedup_first_occurrence_by_corpus_order(spark):
    # the doc with the LOWER id owns the span; later ids are the dups
    docs = spark.createDataFrame(
        [(9, "x y z"), (2, "x y z")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in C.span_dedup_stats(docs, span_words=3).collect()}
    assert out[2].dup_spans == 0
    assert out[9].dup_spans == 1


# -------------------------------------------------------- sampling


def test_rate_threshold_bounds():
    assert C.rate_threshold_hex(0.0) == "00000000"
    # ≥1.0 → "g": above every hex string, so keep-all is exact
    assert C.rate_threshold_hex(1.0) == "g"
    assert C.rate_threshold_hex(2.0) == "g"
    assert C.rate_threshold_hex(0.5) == "7fffffff"


def test_stratified_sample_rates(spark, documents):
    rates = {"src0": 1.0, "src1": 0.0}
    out = C.stratified_sample(
        documents, "source", rates, key_col="doc_id", default_rate=0.5
    )
    counts = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    total = {r.source: r.c for r in documents.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts["src0"] == total["src0"]  # rate 1.0 keeps everything
    assert "src1" not in counts  # rate 0.0 drops everything
    # default rate strata: roughly half, deterministic
    kept_default = sum(v for k, v in counts.items() if k not in rates)
    tot_default = sum(v for k, v in total.items() if k not in rates)
    assert 0.3 * tot_default < kept_default < 0.7 * tot_default


def test_stratified_sample_deterministic(spark, documents):
    rates = {"src0": 0.4}
    a = C.stratified_sample(documents, "source", rates, key_col="doc_id").select("doc_id")
    b = C.stratified_sample(documents, "source", rates, key_col="doc_id").select("doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())


def test_stratified_sample_seed_changes_selection(spark, documents):
    rates = {s: 0.5 for s in ("src0", "src1", "src2")}
    a = {r.doc_id for r in C.stratified_sample(documents, "source", rates, "doc_id", seed="s1").select("doc_id").collect()}
    b = {r.doc_id for r in C.stratified_sample(documents, "source", rates, "doc_id", seed="s2").select("doc_id").collect()}
    assert a != b  # different seeds → different (deterministic) draws


def test_stratified_sample_is_nested_across_rates(spark, documents):
    """Same seed, higher rate ⇒ superset: the scaling-law-subset
    property of threshold sampling (and why mix-rate changes are
    incremental)."""
    small = {
        r.doc_id
        for r in C.stratified_sample(documents, "source", {}, "doc_id", default_rate=0.3).select("doc_id").collect()
    }
    big = {
        r.doc_id
        for r in C.stratified_sample(documents, "source", {}, "doc_id", default_rate=0.6).select("doc_id").collect()
    }
    assert small < big


# ------------------------------------------------ vocab & boilerplate


def test_build_vocab_counts_and_rank(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry")], ["doc_id", "text"]
    )
    rows = {r.token: r for r in C.build_vocab(docs).collect()}
    assert rows["apple"].tf == 3 and rows["apple"].df == 2
    assert rows["banana"].tf == 1 and rows["banana"].df == 1
    assert rows["apple"].rank == 1
    # ties broken by token: banana < cherry
    assert rows["banana"].rank == 2 and rows["cherry"].rank == 3


def test_build_vocab_min_count(spark):
    docs = spark.createDataFrame([(1, "solo common common")], ["doc_id", "text"])
    toks = {r.token for r in C.build_vocab(docs, min_count=2).collect()}
    assert toks == {"common"}


def test_build_vocab_two_phase_rank_equals_single_window(spark):
    """The two-phase range-partitioned rank must equal the legacy
    global-window rank exactly, including tf ties broken by token —
    on a vocabulary larger than the partition count so offsets are
    actually exercised."""
    rows = [
        (i, f"tok{i % 37} tok{i % 11} tok{i % 5} shared")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    single = {r.token: (r.tf, r.df, r.rank) for r in C.build_vocab(docs, rank_partitions=1).collect()}
    two = {r.token: (r.tf, r.df, r.rank) for r in C.build_vocab(docs, rank_partitions=8).collect()}
    assert len(single) > 8
    assert single == two


def test_unigram_surprisal_bucketed_matches_exact_when_collision_free(spark):
    """With more buckets than distinct tokens (no collisions) the
    hashed-LM path must reproduce the exact path bit-for-bit; and it
    still emits one row per non-empty doc."""
    docs = spark.createDataFrame(
        [(1, "common common common common"), (2, "common common rareword common")],
        ["doc_id", "text"],
    )
    exact = {r.doc_id: (r.n_tokens, r.mean_surprisal) for r in C.unigram_surprisal(docs).collect()}
    bucketed = {
        r.doc_id: (r.n_tokens, r.mean_surprisal)
        for r in C.unigram_surprisal(docs, n_buckets_hex=3).collect()
    }
    assert exact == bucketed


def test_boilerplate_spans_flags_template_text(spark):
    footer = "subscribe to our newsletter for updates today"  # 7 words
    docs = spark.createDataFrame(
        [
            (1, "s1", "unique words alpha " + footer),
            (2, "s1", "different content beta " + footer),
            (3, "s1", "more text gamma " + footer),
            (4, "s1", "totally original delta document here now"),
            (5, "s2", "another source entirely " + footer),  # only 1 of 1 in s2
        ],
        ["doc_id", "source", "text"],
    )
    out = C.boilerplate_spans(docs, span_words=3, min_frac=0.5).collect()
    # s1: the footer's 3-word blocks appear in 3/4 docs → flagged;
    # but block boundaries depend on each doc's token offsets, so flag
    # presence (some span ≥ 0.5 in s1), not exact hashes
    s1 = [r for r in out if r.source == "s1"]
    assert len(s1) > 0
    for r in s1:
        assert r.total_docs == 4 and r.frac >= 0.5
    # s2's footer appears in its only doc → frac 1.0 (flagged too)
    s2 = [r for r in out if r.source == "s2"]
    assert all(r.total_docs == 1 for r in s2)


def test_unigram_surprisal_ranks_rare_docs_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common rareword common"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.unigram_surprisal(docs).collect()}
    # doc 2 contains the corpus-rare token → higher mean surprisal
    assert out[2].mean_surprisal > out[1].mean_surprisal
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4
    # all-same-token corpus baseline: −ln(7/8) for doc 1's tokens
    import math

    assert abs(out[1].mean_surprisal - (-math.log(7 / 8))) < 1e-6


def test_curation_projections_stream(spark, tmp_path):
    """pii_scrub (and any stateless curation projection) runs unchanged
    on a stream — no batch-only constructs in the hot path."""
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(1, "mail a@b.com now"), (2, "clean row")], ["doc_id", "text"]
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = C.pii_scrub(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM pii_stream").collect()}
    assert rows[1].n_email == 1 and "<EMAIL>" in rows[1].redacted
    assert rows[2].redacted == "clean row"


def test_weighted_sample_favors_heavy_rows(spark):
    # weight 1000 vs 1: the heavy row must essentially always survive
    # a top-1 draw across many seeds
    rows = [(1, 1000.0), (2, 1.0), (3, 1.0), (4, 1.0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    wins = 0
    for s in range(10):
        top = C.weighted_sample(df, "w", "doc_id", 1, seed=f"s{s}").collect()
        wins += top[0].doc_id == 1
    assert wins >= 8


def test_weighted_sample_deterministic_and_sized(spark, documents):
    a = C.weighted_sample(documents, "n_chars", "doc_id", 3, strata_col="source")
    b = C.weighted_sample(documents, "n_chars", "doc_id", 3, strata_col="source")
    ra = sorted((r.source, r.doc_id) for r in a.collect())
    rb = sorted((r.source, r.doc_id) for r in b.collect())
    assert ra == rb
    from collections import Counter

    per_src = Counter(s for s, _ in ra)
    assert all(v == 3 for v in per_src.values())


def test_corpus_profile_partitioning_invariant(spark, documents):
    """The driver compares value hashes against a fixed DuckDB oracle,
    and __spark_entry__ fans the documents scan out — so every float
    aggregate in the profile must be ACCUMULATION-ORDER independent
    (decimal sums, not double). Pin: identical output at 1, 8, and 32
    partitions."""
    import __spark_entry__ as E

    base = None
    for parts in (1, 8, 32):
        out = [tuple(r) for r in E._profile_docs(documents.repartition(parts)).collect()]
        base = out if base is None else base
        assert out == base


def test_gopher_signals_hand_check(spark):
    docs = spark.createDataFrame(
        [
            (1, "the words be long enough to have value and that is fine with us"),
            (2, "- a\n- b\n- c"),            # all bullet lines
            (3, "so it goes...\nmore here…"),  # all ellipsis lines
            (4, "### # # 1 2 3"),              # symbol soup, no alpha
        ],
        ["doc_id", "text"],
    )
    sig = {r["doc_id"]: r.asDict() for r in C.gopher_quality_signals(docs).collect()}
    assert sig[1]["n_words"] == 14 and sig[1]["n_stop_hits"] >= 4
    assert sig[1]["alpha_word_frac"] == 1.0
    assert sig[2]["bullet_line_frac"] == 1.0
    assert sig[3]["ellipsis_line_frac"] == 1.0
    assert sig[4]["alpha_word_frac"] == 0.0
    assert sig[4]["symbol_word_ratio"] > 0.5
    # mean word length exact: (3+5+2+4+6+2+4+5+3+4+2+4+4+2)/14
    exp = sum(len(w) for w in "the words be long enough to have value and that is fine with us".split()) / 14
    assert abs(sig[1]["mean_word_len"] - exp) < 1e-6


def test_gopher_filter_thresholds(spark):
    good = "the quick brown fox jumps over the lazy dog and then runs away to have " \
           "a long rest with friends that arrive late but happy " * 3
    docs = spark.createDataFrame(
        [(1, good), (2, "too short"), (3, "- a\n" * 60 + good)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["gopher_pass"] for r in C.gopher_quality_filter(docs).collect()}
    assert out[1] is True
    assert out[2] is False          # under 50 words
    assert out[3] is False          # bullet fraction > 0.9


def test_tfidf_keyphrases_ranks_distinctive_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark catalyst common common"),
            (2, "duckdb duckdb oracle common common"),
            (3, "python python common"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in C.tfidf_keyphrases(docs, k=2).collect()}
    # distinctive high-tf terms beat corpus-wide 'common'
    assert out[1]["keyphrases"][0] == "spark"
    assert out[2]["keyphrases"][0] == "duckdb"
    assert out[3]["keyphrases"][0] == "python"
    # scores sorted desc, arrays aligned
    for r in out.values():
        assert len(r["keyphrases"]) == len(r["scores"]) <= 2
        assert r["scores"] == sorted(r["scores"], reverse=True)
    # hand-check doc1 'spark': tf=3, df=1, N=3 -> 3 * (ln(4/2)+1)
    import math
    exp = round(3 * (math.log(4 / 2) + 1), 6)
    assert abs(out[1]["scores"][0] - exp) < 1e-6


def test_tfidf_keyphrases_deterministic_ties(spark):
    docs = spark.createDataFrame([(1, "zebra apple zebra apple")], ["doc_id", "text"])
    out = C.tfidf_keyphrases(docs, k=2).collect()[0]
    assert out["keyphrases"] == ["apple", "zebra"]  # tie -> term asc


# ------------------------------------------ cluster-balanced sampling


def test_cluster_balanced_sample_equalizes_clusters(spark, embeddings):
    kept = C.cluster_balanced_sample(embeddings, n_clusters=8)
    sizes_all = dict(
        C.cluster_balanced_sample(embeddings, n_clusters=8, target_per_cluster=10**9)
        .groupBy("cluster_id").count().collect()
    )
    sizes_kept = dict(kept.groupBy("cluster_id").count().collect())
    target = min(sizes_all.values())
    # every cluster's kept mass is near the smallest cluster's size
    # (md5-threshold keep is Bernoulli per row — binomial tolerance)
    for cid, n_all in sizes_all.items():
        n_kept = sizes_kept.get(cid, 0)
        assert n_kept <= n_all
        tol = 4 * (target ** 0.5) + 2
        assert abs(n_kept - min(target, n_all)) <= tol, (cid, n_kept, target)
    # deterministic: same seed, same rows
    again = C.cluster_balanced_sample(embeddings, n_clusters=8)
    assert kept.select("vec_id").exceptAll(again.select("vec_id")).count() == 0
    assert again.select("vec_id").exceptAll(kept.select("vec_id")).count() == 0


def test_cluster_balanced_sample_empty_and_null_inputs(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    empty = spark.createDataFrame([], schema)
    assert C.cluster_balanced_sample(empty).count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [0.0, 1.0])], schema
    )
    out = C.cluster_balanced_sample(nulls, n_clusters=2)
    assert {r.vec_id for r in out.collect()} <= {2, 3}
    assert out.filter(out.cluster_id.isNull()).count() == 0


def test_dsir_null_predicate_counts_as_raw(spark):
    """Rows where target_pred is NULL (NULL source) must count in the
    RAW unigram model, not vanish from both (ADVICE r3)."""
    rows = [(0, "alpha beta", "wiki"), (1, "alpha beta", None), (2, "alpha gamma", "web")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = C.dsir_log_weights(df, F.col("source") == "wiki")
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {0, 1, 2}
    # NULL-source doc shares the raw model with the web doc: identical
    # text terms must score like raw text, and the explicit-raw twin of
    # doc 1's tokens appears in the model (c_r counts include doc 1)
    explicit = C.dsir_log_weights(
        df.fillna({"source": "web"}), F.col("source") == "wiki"
    )
    want = {r.doc_id: r for r in explicit.collect()}
    for i in got:
        assert got[i].log_weight == want[i].log_weight


def test_dsir_train_null_predicate(spark):
    rows = [(0, "alpha beta", "wiki"), (1, "alpha beta", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    model = C.dsir_train(df, F.col("source") == "wiki")
    explicit = C.dsir_train(df.fillna({"source": "raw"}), F.col("source") == "wiki")
    assert model == explicit


def test_temperature_mix_proportions_and_nesting(spark):
    """alpha flattens source proportions toward equal; budgets are
    nested at a fixed seed/alpha; alpha=1 reproduces natural-proportion
    uniform sampling (same rate for every source)."""
    rows = [(i, "head" if i < 9000 else "tail") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    nat = C.temperature_mix(df, "source", "doc_id", total=2000, alpha=1.0)
    by = {r.source: r.n for r in nat.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # alpha=1: every source keeps the SAME rate (total/N) — proportions natural
    assert by["head"] / by["tail"] == pytest.approx(9.0, rel=0.25)

    flat = C.temperature_mix(df, "source", "doc_id", total=2000, alpha=0.0)
    byf = {r.source: r.n for r in flat.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # alpha=0: expected equal mass per source (1000 each; tail has 1000 rows)
    assert byf["tail"] == pytest.approx(1000, rel=0.15)
    assert byf["head"] == pytest.approx(1000, rel=0.15)

    # nesting: the 1000-budget sample is a subset of the 2000-budget one
    small = {r.doc_id for r in C.temperature_mix(df, "source", "doc_id", 1000, 0.5).collect()}
    large = {r.doc_id for r in C.temperature_mix(df, "source", "doc_id", 2000, 0.5).collect()}
    assert small <= large

    # NULL strata participate as their own sentinel stratum (ADVICE r4:
    # silently dropping them loses documents with no signal); alpha=0
    # gives the one-row NULL source equal mass → its row survives
    null_rows = [(99_990 + i, None) for i in range(5)]
    with_null = df.union(spark.createDataFrame(null_rows, df.schema))
    mixed = C.temperature_mix(with_null, "source", "doc_id", 3000, alpha=0.0)
    assert mixed.filter(F.col("source").isNull()).count() == 5
    # and the output keeps the original schema (no _s leak, NULL intact)
    assert mixed.columns == df.columns
    assert C.temperature_mix(df.limit(0), "source", "doc_id", 100).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        C.temperature_mix(df, "source", "doc_id", total=-1)


def test_bigram_surprisal_orders_predictability(spark):
    """A doc whose bigrams repeat (predictable) must score lower than a
    doc of the same tokens in bigram-novel order; single-token docs are
    scored by the unigram rung; empty docs emit no row."""
    rows = [
        (1, "the cat sat the cat sat the cat sat the cat sat"),
        (2, "sat the the cat cat sat cat the sat sat cat the"),  # same unigrams
        (3, "solo"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in C.bigram_surprisal(df).collect()}
    assert set(out) == {1, 2, 3}  # empty doc drops
    # same unigram distribution, so the bigram LM is what separates them
    assert out[1].bigram_surprisal < out[2].bigram_surprisal
    assert out[3].n_tokens == 1 and out[3].bigram_surprisal > 0
    # deterministic across plans/runs
    again = {r.doc_id: r.bigram_surprisal for r in C.bigram_surprisal(df).collect()}
    assert again == {k: v.bigram_surprisal for k, v in out.items()}


def test_bigram_train_apply_matches_batch_and_handles_novel(spark):
    """Frozen-LM scoring: on the training corpus bigram_apply reproduces
    bigram_surprisal exactly; novel-vocabulary docs score finite (the
    half-count floor) and higher than in-distribution text."""
    rows = [(i, "the cat sat on the mat and the cat sat again") for i in range(5)]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    uni, bi = C.bigram_train(train)
    self_scored = {
        r.doc_id: r.bigram_surprisal
        for r in C.bigram_apply(train, uni, bi).collect()
    }
    batch = {r.doc_id: r.bigram_surprisal for r in C.bigram_surprisal(train).collect()}
    assert self_scored == batch
    new = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "zq xv wk unseen zz vocab")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bigram_surprisal for r in C.bigram_apply(new, uni, bi).collect()}
    import math

    assert all(math.isfinite(v) for v in out.values())
    assert out[101] > out[100]  # novel vocabulary ranks as high surprisal


def test_temperature_mix_nonstring_strata(spark):
    """Boolean (and other non-string) strata must sample, not silently
    drop: Python str(True)='True' vs Spark cast 'true' used to zero
    every rate lookup (code-review r4)."""
    bdf = spark.createDataFrame(
        [(i, i < 8000) for i in range(10_000)], "doc_id long, is_code boolean"
    )
    out = C.temperature_mix(bdf, "is_code", "doc_id", total=1000, alpha=0.5)
    n = out.count()
    assert 500 < n < 1500  # near-budget, not zero
    assert out.filter(~F.col("is_code")).count() > 0  # both strata present


# ---------------------------------------------- gopher full battery


def test_gopher_repetition_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world\nhello world\nunique line here"),
            (2, "para one text\n\npara one text\n\nother para"),
            (3, "aa bb cc dd ee ff gg hh " * 3),
            (4, "x y x y x y x y distinct tail words"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.gopher_repetition(docs).collect()}
    # doc 1: 1 of 3 lines repeats; 11 of 40 raw chars; top 2-gram
    # 'hello world' x2 over canonical len 40
    assert out[1].dup_line_frac == pytest.approx(1 / 3, abs=1e-6)
    assert out[1].dup_line_char_frac == pytest.approx(11 / 40, abs=1e-6)
    assert out[1].top_2_gram_char_frac == pytest.approx(22 / 40, abs=1e-6)
    assert out[1].dup_5_gram_char_frac == 0.0
    # doc 2: paragraph repeats (1 of 3)
    assert out[2].dup_para_frac == pytest.approx(1 / 3, abs=1e-6)
    assert out[2].dup_para_char_frac == pytest.approx(13 / 40, abs=1e-6)
    # doc 3: period-8 self-repetition -> every 5..10-gram duplicated,
    # whole canonical text covered
    for n in (5, 6, 7, 8, 9, 10):
        assert out[3][f"dup_{n}_gram_char_frac"] == 1.0
    # doc 4: 'x y' x4, glen 3, canonical len 35; 5-gram dup mask covers
    # tokens 0..7 = 8 chars + 7 inner spaces
    assert out[4].top_2_gram_char_frac == pytest.approx(12 / 35, abs=1e-6)
    assert out[4].dup_5_gram_char_frac == pytest.approx(15 / 35, abs=1e-6)
    assert out[4].dup_7_gram_char_frac == 0.0


def test_gopher_repetition_degenerate_docs(spark):
    """Empty and below-n docs report all-zero signals, never NULLs."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "short"), (3, None)], ["doc_id", "text"]
    )
    rows = C.gopher_repetition(docs).collect()
    assert len(rows) == 3
    for r in rows:
        for c in r.asDict():
            if c != "doc_id":
                assert r[c] == 0.0, (r["doc_id"], c, r[c])


def test_gopher_repetition_top_gram_overlap_uncapped(spark):
    """Paper convention: top-n-gram coverage is count x glen, not
    de-overlapped — degenerate repetition can exceed 1."""
    docs = spark.createDataFrame([(1, "a a a a a a")], ["doc_id", "text"])
    r = C.gopher_repetition(docs).collect()[0]
    # 'a a' occurs 5x, glen 3, canonical len 11 -> 15/11
    assert r.top_2_gram_char_frac == pytest.approx(15 / 11, abs=1e-6)
    # dup mask is de-overlapped: covers everything -> exactly 1
    assert r.dup_5_gram_char_frac == 1.0


# ---------------------------------------------- bloom decontamination


def test_bloom_decontaminate_superset_of_exact(spark, documents):
    """The one-sided guarantee: bloom hits per doc >= exact hits, and
    every exactly-contaminated doc is bloom-contaminated (no false
    negatives), on real corpus text."""
    docs = documents.limit(120)
    bench = documents.orderBy("doc_id").limit(8).select("text")
    bloom = C.build_ngram_bloom(bench, n=6)
    exact = {r.doc_id: r for r in C.decontaminate(docs, bench, n=6).collect()}
    bl = {r.doc_id: r for r in C.decontaminate_bloom(docs, bloom, n=6).collect()}
    assert set(exact) == set(bl)
    for d in exact:
        assert bl[d].contaminated_ngrams >= exact[d].contaminated_ngrams
        if exact[d].contaminated:
            assert bl[d].contaminated
        assert bl[d].total_ngrams == exact[d].total_ngrams


def test_bloom_decontaminate_fpr_bounded(spark):
    """Disjoint vocabularies: the bloom over-flags at most a small
    fraction of clean grams (deterministic — xxhash64 is seeded)."""
    bench = spark.createDataFrame(
        [(" ".join(f"bench{i+j}" for j in range(12)),) for i in range(0, 400, 4)],
        ["text"],
    )
    docs = spark.createDataFrame(
        [(i, " ".join(f"corpus{i}x{j}" for j in range(40))) for i in range(50)],
        ["doc_id", "text"],
    )
    bloom = C.build_ngram_bloom(bench, n=5, fpp=1e-3)
    out = C.decontaminate_bloom(docs, bloom, n=5).collect()
    total = sum(r.total_ngrams for r in out)
    fps = sum(r.contaminated_ngrams for r in out)
    assert total > 1000
    assert fps / total < 0.01


def test_bloom_sliced_build_parallelism_independent(spark):
    """The sliced build (r6): identical bitmap whatever the input
    parallelism, build stage NOT coalesced (the r5 scheme capped the
    distinct stage at 16 tasks), and multi-slice assembly places each
    stripe at its offset (forced tiny slice target)."""
    import numpy as np

    import customkb_spark.operators.curation as C

    rows = [(" ".join(f"w{i+j}" for j in range(10)),) for i in range(0, 300, 3)]
    bench1 = spark.createDataFrame(rows, ["text"]).coalesce(1)
    bench64 = spark.createDataFrame(rows, ["text"]).repartition(64)
    b1 = C.build_ngram_bloom(bench1, n=4)
    b64 = C.build_ngram_bloom(bench64, n=4)
    assert (b1.m_bits, b1.k, b1.n_items) == (b64.m_bits, b64.k, b64.n_items)
    assert np.array_equal(b1.bitmap, b64.bitmap)

    # multi-slice path: shrink the stripe so n_slices > 1
    orig = C._BLOOM_SLICE_TARGET_BITS
    C._BLOOM_SLICE_TARGET_BITS = 1024
    try:
        bs = C.build_ngram_bloom(bench64, n=4)
    finally:
        C._BLOOM_SLICE_TARGET_BITS = orig
    assert np.array_equal(bs.bitmap, b1.bitmap)

    # plan shape: no Coalesce anywhere; the only exchange is the
    # by-slice repartition (hashpartitioning on slice)
    from pyspark.sql import functions as F

    hashed = bench64.select(
        F.explode(C.word_ngrams("text", 4)).alias("ngram")
    ).distinct().select(
        F.xxhash64("ngram").alias("h1"),
        F.xxhash64("ngram", F.lit(C._BLOOM_SEED2)).alias("h2"),
    )
    from tests.test_plans import explain_str

    C._BLOOM_SLICE_TARGET_BITS = 1024  # force n_slices > 1
    try:
        sliced, _, n_slices = C._bloom_slice_plan(hashed, b1.m_bits, b1.k)
    finally:
        C._BLOOM_SLICE_TARGET_BITS = orig
    assert n_slices > 1
    plan = explain_str(sliced, "extended")
    assert "Coalesce" not in plan
    assert "hashpartitioning(slice" in plan


def test_bloom_roundtrip_and_empty_benchmark(spark):
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], ["text"]
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (2, "nothing shared at all in this one today friend")],
        ["doc_id", "text"],
    )
    bloom = C.build_ngram_bloom(bench, n=5)
    rt = C.NgramBloom.from_df(bloom.to_df(spark))
    assert (rt.m_bits, rt.k, rt.n_items) == (bloom.m_bits, bloom.k, bloom.n_items)
    a = {r.doc_id: r.contaminated_ngrams for r in C.decontaminate_bloom(docs, bloom, n=5).collect()}
    b = {r.doc_id: r.contaminated_ngrams for r in C.decontaminate_bloom(docs, rt, n=5).collect()}
    assert a == b and a[1] > 0 and a[2] == 0

    empty = C.build_ngram_bloom(
        spark.createDataFrame([], "text string"), n=5
    )
    assert empty.n_items == 0
    out = {r.doc_id: r.contaminated for r in C.decontaminate_bloom(docs, empty, n=5).collect()}
    assert out == {1: False, 2: False}


def test_corpus_token_profile_approx_tier(spark, documents):
    """approx_percentile tier: identical grouping/counts on real data;
    percentile agreement pinned on a large synthetic group (tiny groups
    legitimately differ — the sketch returns an element, exact
    interpolates); the plan stays partial-aggregated (sketches combine
    map-side, no per-group full value buffering on one reducer)."""
    exact = {
        (r.source, r.lang): r for r in C.corpus_token_profile(documents).collect()
    }
    approx = {
        (r.source, r.lang): r
        for r in C.corpus_token_profile(documents, approx=True).collect()
    }
    assert set(exact) == set(approx) and len(exact) > 1
    for key in exact:
        e, a = exact[key], approx[key]
        assert a.n_docs == e.n_docs and a.total_tokens == e.total_tokens

    big = spark.range(20000).selectExpr(
        "'s' AS source", "'en' AS lang",
        # text with (id % 200 + 1) tokens
        "array_join(transform(sequence(1, CAST(id % 200 AS INT) + 1), x -> 'w'), ' ') AS text",
    )
    e = C.corpus_token_profile(big).collect()[0]
    a = C.corpus_token_profile(big, approx=True).collect()[0]
    # uniform 1..200: p50≈100.5, p95≈190; GK rank error 1/10000 → ±1 value
    assert abs(a.p50_tokens - e.p50_tokens) <= 1.0
    assert abs(a.p95_tokens - e.p95_tokens) <= 1.0

    plan = (
        C.corpus_token_profile(documents, approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_approx_percentile" in plan


# -------------------------------------------- C4 / CCNet page cleaning


def test_c4_page_filters_line_and_page_rules(spark):
    docs = spark.createDataFrame(
        [
            (
                1,
                "This is a good long sentence here.\nshort.\n"
                "Another fine long sentence right there!\n"
                "uses javascript for rendering today, yes.\n"
                "no terminal punctuation on this long line",
            ),
            (
                2,
                "lorem ipsum dolor sit amet something fine. And a second "
                "proper sentence right here? Plus a third one too!",
            ),
            (
                3,
                "All three sentences sit on one line here. Second proper "
                "sentence is here now! Third one arrives right now?",
            ),
            (
                4,
                "Check our Privacy Policy for details today. Second proper "
                "sentence is here now! Third one arrives okay?",
            ),
            (
                5,
                "A code page with braces { inside it here. Second proper "
                "sentence is here now! Third one arrives okay?",
            ),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in C.c4_page_filters(docs, bad_words=("dolor",)).collect()
    }
    r1 = out[1]
    assert r1.lines_total == 5 and r1.lines_kept == 2
    assert "javascript" not in r1.clean_text  # line marker removed
    assert "short." not in r1.clean_text  # < 5 words
    assert "no terminal" not in r1.clean_text  # punctuation rule
    assert r1.n_sentences == 2 and not r1.keep  # < 3 sentences -> page drop
    assert out[2].has_lorem and out[2].has_bad_word and not out[2].keep
    assert out[3].keep and out[3].n_sentences == 3
    assert out[4].has_policy and not out[4].keep  # case-insensitive marker
    assert out[5].has_brace and not out[5].keep


def test_c4_bad_word_is_whole_word(spark):
    # 'ass' must not fire inside 'associated' (the C4 list is matched
    # on word boundaries)
    docs = spark.createDataFrame(
        [
            (1, "The associated work is described in this sentence today."),
            (2, "This page mentions ass once in a full sentence right here."),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r for r in C.c4_page_filters(docs, bad_words=("ass",)).collect()
    }
    assert not out[1].has_bad_word
    assert out[2].has_bad_word


def test_c4_page_filters_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "x.")], ["doc_id", "text"])
    plan = (
        C.c4_page_filters(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-side only: parquet-scan speed
    assert "Python" not in plan


def test_line_dedup_cross_doc_and_normalization(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma\nunique one\nCommon Footer 2024!"),
            (2, "common footer\nalpha beta gamma\nunique two"),
            (3, "!!!\nalpha beta gamma"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.line_dedup(docs).collect()}
    # doc 1 owns every line (lowest corpus order)
    assert out[1].lines_removed == 0
    assert out[1].clean_text == "alpha beta gamma\nunique one\nCommon Footer 2024!"
    # 'common footer' normalizes equal to 'Common Footer 2024!' (case,
    # digits, punctuation stripped) -> removed; 'alpha beta gamma' too
    assert out[2].clean_text == "unique two" and out[2].lines_removed == 2
    # punctuation-only line normalizes to empty: never a dedup candidate
    assert out[3].clean_text == "!!!" and out[3].lines_removed == 1


def test_line_dedup_internal_dup_and_fully_deduped_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "same line twice here\nsame line twice here"),
            (2, "same line twice here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.line_dedup(docs).collect()}
    # in-document repeat: first position wins
    assert out[1].clean_text == "same line twice here"
    assert out[1].lines_removed == 1
    # a doc whose every line is a duplicate survives as an empty shell
    assert out[2].clean_text == "" and out[2].lines_kept == 0
    assert out[2].dup_line_frac == 1.0


def test_refinedweb_line_corrections_rules(spark):
    docs = spark.createDataFrame(
        [
            (
                1,
                "A normal sentence that survives the pass fine.\n"
                "MENU HOME ABOUT CONTACT\n"  # mainly uppercase
                "42\n"  # numeric only
                "3 likes\n"  # social counter
                "Home\n"  # single word
                "Another normal sentence stays in place here.",
            ),
            (2, "All of this text is perfectly fine and nothing is removed."),
            (3, "Tiny body here stays.\nNAVIGATION"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r for r in C.refinedweb_line_corrections(docs).collect()
    }
    r1 = out[1]
    assert r1.lines_total == 6 and r1.lines_kept == 2
    assert "MENU" not in r1.clean_text and "42" not in r1.clean_text
    assert "likes" not in r1.clean_text and "Home" not in r1.clean_text
    assert not r1.keep  # way over the 5% removed-chars budget
    assert out[2].keep and out[2].removed_char_frac == 0.0
    # doc 3: the dropped NAVIGATION line is >5% of its chars
    assert out[3].lines_kept == 1 and not out[3].keep


def test_refinedweb_mixed_case_and_empty_lines_survive(spark):
    docs = spark.createDataFrame(
        [
            (
                1,
                "Mixed Case Lines Are Fine Here Today.\n\n"
                "lowercase line with several words here",
            )
        ],
        ["doc_id", "text"],
    )
    r = C.refinedweb_line_corrections(docs).collect()[0]
    # Title Case is ~1/5 uppercase letters: under the 0.6 bar; the
    # empty line has no letters and zero words: exempt from every rule
    assert r.lines_kept == 3 and r.keep


def test_refinedweb_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "x y.")], ["doc_id", "text"])
    plan = (
        C.refinedweb_line_corrections(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_token_budget_sample_prefix_and_budgets(spark):
    from pyspark.sql import Window

    import random

    random.seed(3)
    rows = [
        (
            i,
            " ".join("w%d" % random.randrange(50) for _ in range(random.randrange(5, 30))),
            "s%d" % (i % 3),
        )
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    budgets = {"s0": 300, "s1": 150}
    out = C.token_budget_sample(docs, budgets).collect()
    per: dict[str, int] = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + r.n_tokens
    # budget respected per stratum; unbudgeted stratum dropped entirely
    assert all(per[s] <= b for s, b in budgets.items())
    assert not any(r.source == "s2" for r in out)
    # the two-phase bucket cumsum must equal the plain per-stratum
    # window EXACTLY (same hash order, same prefix cut)
    from customkb_spark.functions import text as X

    hk = F.md5(
        F.concat_ws(":", "source", F.col("doc_id").cast("string"), F.lit("tbudget-v1"))
    )
    ref = (
        docs.select(
            "doc_id", "source", F.size(X.tokens("text")).cast("long").alias("n")
        )
        .withColumn("hk", hk)
        .withColumn(
            "cum", F.sum("n").over(Window.partitionBy("source").orderBy("hk", "doc_id"))
        )
    )
    refkept = {
        (r.doc_id, r.cum)
        for r in ref.collect()
        if r.source in budgets and r.cum <= budgets[r.source]
    }
    assert {(r.doc_id, r.cum_tokens) for r in out} == refkept
    # deterministic across invocations
    again = {(r.doc_id, r.cum_tokens) for r in C.token_budget_sample(docs, budgets).collect()}
    assert again == refkept


def test_token_budget_sample_no_single_reducer_sort(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s0"), (2, "d e", "s0")], ["doc_id", "text", "source"]
    )
    plan = (
        C.token_budget_sample(docs, {"s0": 10})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # windows are partitioned by (stratum, bucket) or run over the tiny
    # per-bucket table; no global single-partition exchange
    assert "SinglePartition" not in plan


def test_corpus_zipf_fit_recovers_planted_slope(spark):
    import math

    # plant an exact power law: token w_r appears round(1000 * r^-0.8)
    # times -> the regression must recover slope ~= -0.8 with r2 ~= 1
    rows = []
    doc = 0
    for r in range(1, 41):
        n = max(1, round(1000 * r ** -0.8))
        toks = (f"w{r:03d} " * n).strip()
        rows.append((doc, toks))
        doc += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = C.corpus_zipf_fit(docs, top_k=40).collect()[0]
    assert out.n_tokens_fit == 40
    assert abs(out.slope - (-0.8)) < 0.02  # rounding of counts only
    assert out.r2 > 0.999
    # intercept ~= ln(1000)
    assert abs(out.intercept - math.log(1000)) < 0.05


# ------------------------------------------- semantic decontamination


def _planted_embeddings():
    """(corpus rows, bench rows, contaminated ids): 3 benchmark vectors;
    corpus = 2 exact copies, 2 paraphrases (tiny angular noise), and
    clean docs near other random directions."""
    import numpy as np

    rng = np.random.default_rng(11)
    bench = rng.normal(size=(3, 32))
    bench /= np.linalg.norm(bench, axis=1, keepdims=True)
    rows, dirty = [], set()
    vid = 0
    for b in range(3):
        for kind in ("copy", "para"):
            v = bench[b] + (0.0 if kind == "copy" else 0.05) * rng.normal(size=32)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            dirty.add(vid)
            vid += 1
    for _ in range(40):
        v = rng.normal(size=32)
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    return rows, [(i, bench[i].tolist()) for i in range(3)], dirty


def test_decontaminate_semantic_catches_paraphrases(spark):
    rows, bench, dirty = _planted_embeddings()
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(bench, "vec_id long, embedding array<double>")
    out = C.decontaminate_semantic(
        docs, bdf, nlist=8, nprobe=3, threshold=0.95
    ).collect()
    assert len(out) == len(rows)  # clean docs preserved via left join
    flagged = {r["vec_id"] for r in out if r["contaminated"]}
    assert flagged == dirty  # copies AND paraphrases, nothing else
    # exact copies report sim 1.0 against their own bench item
    for r in out:
        if r["vec_id"] in (0, 2, 4):  # the copy rows (even ids < 6)
            assert r["best_sim"] == pytest.approx(1.0, abs=1e-6)
            assert r["best_bench_id"] == r["vec_id"] // 2


def test_decontaminate_semantic_equals_bruteforce_at_full_probe(spark):
    """With nprobe = nlist (every cell probed) the cell scoping is
    exhaustive: flags must equal the brute-force cosine verdicts —
    locks the cell-scoped join against dropping boundary pairs."""
    import numpy as np

    rows, bench, _ = _planted_embeddings()
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(bench, "vec_id long, embedding array<double>")
    thr = 0.8
    out = {
        r["vec_id"]: r["contaminated"]
        for r in C.decontaminate_semantic(
            docs, bdf, nlist=4, nprobe=4, threshold=thr
        ).collect()
    }
    B = np.array([b for _, b in bench])
    for vid, v in rows:
        truth = bool((B @ np.array(v)).max() >= thr)
        assert out[vid] == truth, vid
