"""Streaming dedup + incremental BM25 stats: streaming results match
their batch twins; second-wave merge equals full rebuild."""

from pyspark.sql import functions as F

from customkb_spark.operators import bm25 as B
from customkb_spark.streaming import dedup as SD


def _docs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id: long, text: string, ts_s: string")
    return df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_streaming_dedup_exact_drops_repeats(spark, tmp_path):
    rows = [
        (1, "alpha beta gamma", "2024-01-01 00:00:01"),
        (2, "alpha   beta\tgamma", "2024-01-01 00:05:00"),  # ws-normalized dup of 1
        (3, "unique text here", "2024-01-01 00:10:00"),
        (4, "alpha beta gamma", "2024-01-01 00:20:00"),     # exact dup of 1
    ]
    src = str(tmp_path / "src")
    _docs(spark, rows).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        SD.streaming_dedup_exact(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect())
    # one survivor per distinct normalized text: {1-or-2-or-4} and {3}
    assert len(kept) == 2 and 3 in kept


def test_incremental_bm25_stats_matches_batch(spark, sf_dir, tmp_path):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    wave1 = docs.filter("doc_id % 2 = 0")
    wave2 = docs.filter("doc_id % 2 = 1")
    src = str(tmp_path / "docs_src")
    stats_path = str(tmp_path / "term_stats")
    ckpt = str(tmp_path / "ckpt")

    # wave 1 lands, stream catches up
    wave1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    SD.incremental_bm25_stats(stream, stats_path, ckpt).awaitTermination(120)
    stats1, n1 = SD.read_term_stats(spark, stats_path)
    assert n1 == wave1.count()

    # wave 2 lands, the SAME checkpoint processes only the new files
    wave2.write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    SD.incremental_bm25_stats(stream, stats_path, ckpt).awaitTermination(120)
    stats2, n2 = SD.read_term_stats(spark, stats_path)
    assert n2 == docs.count()

    # merged incremental stats == batch rebuild over the full corpus
    postings = B.build_postings(docs, "doc_id", "text")
    batch = {
        r["term"]: (r["df"], round(r["idf"], 6))
        for r in B.build_term_stats(postings, docs.count()).collect()
    }
    got = {r["term"]: (r["df"], round(r["idf"], 6)) for r in stats2.collect()}
    assert got == batch


def test_streaming_semantic_dedup_admits_and_replays_idempotently(spark, tmp_path):
    """Two waves through the streaming SemDeDup gate: wave 1 seeds the
    kept table (internal dup resolved to one survivor), wave 2 rejects
    a semantic dup of kept and admits the novel doc; re-running wave 2
    with a fresh checkpoint (worst-case replay) appends nothing."""
    import numpy as np

    from customkb_spark.embedding.index import train_centroids

    rng = np.random.default_rng(5)
    a, b, c = (rng.standard_normal(8) for _ in range(3))
    vec = lambda v: [float(x) for x in v]
    all_rows = [
        (1, vec(a)), (2, vec(a * 1.001)),          # wave 1: internal dup pair
        (3, vec(b)),                                # wave 1: novel
        (10, vec(a * 0.999)),                       # wave 2: dup of kept
        (11, vec(c)),                               # wave 2: novel
    ]
    emb_schema = "vec_id: long, embedding: array<double>"
    cents = train_centroids(
        spark.createDataFrame(all_rows, emb_schema), "embedding",
        nlist=2, sample_size=100,
    )
    kept_path = str(tmp_path / "kept")

    def run_wave(rows, ckpt):
        src = str(tmp_path / f"src_{ckpt}")
        spark.createDataFrame(rows, emb_schema).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = SD.streaming_semantic_dedup(
            stream, kept_path, str(tmp_path / f"ck_{ckpt}"), cents,
            threshold=0.99,
        )
        q.awaitTermination(120)

    run_wave(all_rows[:3], "w1")
    kept1 = sorted(r.vec_id for r in spark.read.parquet(kept_path).collect())
    assert 3 in kept1 and len(kept1) == 2  # one of {1,2} + {3}

    run_wave(all_rows[3:], "w2")
    kept2 = sorted(r.vec_id for r in spark.read.parquet(kept_path).collect())
    assert kept2 == kept1 + [11]  # 10 rejected as dup of kept, 11 admitted

    run_wave(all_rows[3:], "w2_replay")  # fresh checkpoint = full replay
    kept3 = sorted(r.vec_id for r in spark.read.parquet(kept_path).collect())
    assert kept3 == kept2  # id anti-join makes the append idempotent


def test_streaming_semantic_dedup_equals_batch_apply(spark, tmp_path):
    """Multi-batch streaming==batch equivalence (VERDICT r4 #7): three
    waves where batch-internal AND cross-batch duplicates coexist; the
    final streaming kept table must equal ``semdedup_apply`` on the
    concatenated corpus under the same frozen centroids.

    Groups are tight clusters (all-pairs >= threshold, no chains) and
    each cross-batch group's FIRST-arriving member is also its
    low-centroid-sim member, so the stream's greedy first-wins
    admission and the batch keep policy pick the same survivors — the
    regime where the two modes are defined to agree (a chain A~B~C
    split across batches is the documented divergence case: greedy
    admission evaluates against survivors only)."""
    import math

    import numpy as np

    from customkb_spark.operators.dedup import semdedup_apply

    def v0(deg):  # cell-0 plane: (e0, e2)
        r = math.radians(deg)
        return [math.cos(r), 0.0, math.sin(r), 0.0]

    def v1(deg):  # cell-1 plane: (e1, e3)
        r = math.radians(deg)
        return [0.0, math.cos(r), 0.0, math.sin(r)]

    cents = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    waves = [
        # wave 1: g1 leader (lowest centroid-sim of its group) + singleton
        [(1, v0(20)), (2, v0(70))],
        # wave 2: cross-batch dup of 1, plus an internal dup pair in cell 1
        [(5, v0(18)), (6, v1(24)), (7, v1(25))],
        # wave 3: another cross-batch dup of 1, plus a cell-1 singleton
        [(9, v0(19)), (8, v1(65))],
    ]
    emb_schema = "vec_id: long, embedding: array<double>"
    kept_path = str(tmp_path / "kept_eq")

    for i, rows in enumerate(waves):
        src = str(tmp_path / f"eq_src_{i}")
        spark.createDataFrame(rows, emb_schema).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = SD.streaming_semantic_dedup(
            stream, kept_path, str(tmp_path / f"eq_ck_{i}"), cents, threshold=0.95
        )
        q.awaitTermination(120)

    stream_kept = sorted(r.vec_id for r in spark.read.parquet(kept_path).collect())

    full = spark.createDataFrame([r for w in waves for r in w], emb_schema)
    batch_marks = semdedup_apply(full, cents, threshold=0.95, keep="low_centroid_sim")
    batch_kept = sorted(r.id for r in batch_marks.filter("kept").collect())

    assert stream_kept == batch_kept == [1, 2, 7, 8]


def _run_minhash_wave(spark, tmp_path, rows, tag, kept_dir):
    src = str(tmp_path / f"mh_src_{tag}")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = SD.streaming_minhash_dedup(
        stream, kept_dir, str(tmp_path / f"mh_ck_{tag}"),
        num_hashes=16, bands=4, shingle_n=3, threshold=0.5,
    )
    q.awaitTermination(120)


def test_streaming_minhash_dedup_admits_rejects_and_replays(spark, tmp_path):
    """Lexical streaming gate: wave 1 seeds; wave 2 rejects a 90%-copy
    of kept, admits the novel doc, and collapses a batch-internal
    near-dup pair to its min-id member; a fresh-checkpoint replay of
    wave 2 appends nothing. Final kept set equals the batch twin
    (minhash pairs → connected components, keep-first) on the
    concatenated corpus."""
    base = ("the quick brown fox jumps over the lazy dog while seven "
            "wizards brew strong coffee beside the ancient stone bridge")
    novel = ("completely different subject matter about distributed "
             "query engines shuffling columnar batches across executor "
             "boundaries with adaptive partition coalescing enabled")
    third = ("yet another unrelated document describing tidal patterns "
             "along rocky coastlines where migratory birds gather every "
             "autumn before the long southern crossing begins")
    waves = [
        [(1, base), (2, novel)],
        [(10, base + " extra"), (11, third),
         (12, third + " tail"), (13, third + " tail x")],
    ]
    kept_dir = str(tmp_path / "mh_kept")

    _run_minhash_wave(spark, tmp_path, waves[0], "w1", kept_dir)
    kept1 = sorted(r.id for r in spark.read.parquet(f"{kept_dir}/docs").collect())
    assert kept1 == [1, 2]

    _run_minhash_wave(spark, tmp_path, waves[1], "w2", kept_dir)
    kept2 = sorted(r.id for r in spark.read.parquet(f"{kept_dir}/docs").collect())
    # 10 rejected (near-dup of kept 1); 11 admitted; {11,12,13} are one
    # internal near-dup group -> min id 11 survives
    assert kept2 == [1, 2, 11]

    _run_minhash_wave(spark, tmp_path, waves[1], "w2_replay", kept_dir)
    kept3 = sorted(r.id for r in spark.read.parquet(f"{kept_dir}/docs").collect())
    assert kept3 == kept2

    # batch twin on the concatenated corpus (first-wins == keep-first
    # here: every group's min id arrived first)
    from customkb_spark.operators.dedup import (
        connected_components,
        minhash_lsh_duplicates,
    )

    full = spark.createDataFrame(
        [r for w in waves for r in w], "doc_id long, text string"
    )
    pairs = minhash_lsh_duplicates(full, "doc_id", "text", 16, 4, 3, 0.5)
    comps = connected_components(pairs)
    losers = {r.id for r in comps.filter("id != cluster_id").collect()}
    batch_kept = sorted(d for d, _ in [r for w in waves for r in w] if d not in losers)
    assert kept3 == batch_kept


def _run_substr_wave(spark, tmp_path, rows, tag, kept_dir, k=4):
    src = str(tmp_path / f"ss_src_{tag}")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = SD.streaming_substring_dedup(
        stream, kept_dir, str(tmp_path / f"ss_ck_{tag}"), k=k
    )
    q.awaitTermination(120)


def test_streaming_substring_dedup_equivalence_and_replay(spark, tmp_path):
    """ExactSubstr streaming gate: cross-batch AND batch-internal
    duplicated spans coexist; the final docs table equals the batch
    operator on the concatenated corpus (ascending-id arrival = corpus
    order), and a fresh-checkpoint replay changes nothing."""
    from customkb_spark.operators.dedup import exact_substring_dedup

    shared = "one two three four five six seven eight"
    inner = "alpha beta gamma delta epsilon zeta"
    waves = [
        [(1, shared + " enda"), (2, "completely different tokens here today now")],
        [
            (10, "prefix words " + shared + " suffix"),   # cross-batch dup
            (11, inner + " first"),                        # internal canonical
            (12, "intro " + inner + " outro"),             # internal dup
        ],
    ]
    kept_dir = str(tmp_path / "ss_kept")

    _run_substr_wave(spark, tmp_path, waves[0], "w1", kept_dir)
    _run_substr_wave(spark, tmp_path, waves[1], "w2", kept_dir)
    docs1 = {r.doc_id: r for r in spark.read.parquet(f"{kept_dir}/docs").collect()}
    assert set(docs1) == {1, 2, 10, 11, 12}
    assert docs1[1].removed_tokens == 0
    assert docs1[10].text == "prefix words suffix" and docs1[10].removed_tokens == 8
    assert docs1[11].removed_tokens == 0
    assert docs1[12].text == "intro outro" and docs1[12].removed_tokens == 6

    # replay wave 2 with a fresh checkpoint: nothing changes
    _run_substr_wave(spark, tmp_path, waves[1], "w2_replay", kept_dir)
    docs2 = {r.doc_id: r for r in spark.read.parquet(f"{kept_dir}/docs").collect()}
    assert len(docs2) == len(docs1)
    assert {d: (r.text, r.removed_tokens) for d, r in docs2.items()} == {
        d: (r.text, r.removed_tokens) for d, r in docs1.items()
    }

    # batch twin on the concatenated corpus
    full = spark.createDataFrame(
        [r for w in waves for r in w], "doc_id long, text string"
    )
    twin = {r.doc_id: r for r in exact_substring_dedup(full, k=4).collect()}
    assert {d: (r.text, r.n_tokens, r.removed_tokens) for d, r in docs2.items()} == {
        d: (r.text, r.n_tokens, r.removed_tokens) for d, r in twin.items()
    }


def test_streaming_substring_dedup_within_batch_only(spark, tmp_path):
    """A single batch behaves exactly like the batch operator (state
    empty): internal repeats merge and cut, singletons untouched."""
    rows = [(1, "p q r s t u p q r s t u"), (2, "totally novel words here")]
    kept_dir = str(tmp_path / "ss_kept_single")
    _run_substr_wave(spark, tmp_path, rows, "solo", kept_dir, k=4)
    docs = {r.doc_id: r for r in spark.read.parquet(f"{kept_dir}/docs").collect()}
    assert docs[1].removed_tokens == 6 and docs[1].text == "p q r s t u"
    assert docs[2].removed_tokens == 0


# ------------------------------ streaming CCNet line-dedup gate


def _run_line_wave(spark, tmp_path, rows, tag, kept_dir):
    src = str(tmp_path / f"ld_src_{tag}")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = SD.streaming_line_dedup(stream, kept_dir, str(tmp_path / f"ld_ck_{tag}"))
    q.awaitTermination(120)


def test_streaming_line_dedup_equivalence_and_replay(spark, tmp_path):
    """CCNet line gate: cross-batch AND batch-internal duplicate lines
    coexist (plus normalization collisions); final docs == batch
    line_dedup on the concatenated corpus; fresh-checkpoint replay
    changes nothing."""
    from customkb_spark.operators.curation import line_dedup

    waves = [
        [
            (1, "alpha beta gamma\nunique one here\nCommon Footer 2024!"),
            (2, "totally different body\n!!!"),
        ],
        [
            (10, "common footer\nalpha beta gamma\nunique two here"),  # cross-batch dups
            (11, "repeated inside\nrepeated inside\nfresh line stays"),  # internal dup
        ],
    ]
    kept_dir = str(tmp_path / "ld_kept")
    _run_line_wave(spark, tmp_path, waves[0], "w1", kept_dir)
    _run_line_wave(spark, tmp_path, waves[1], "w2", kept_dir)
    docs1 = {r.doc_id: r for r in spark.read.parquet(f"{kept_dir}/docs").collect()}
    assert set(docs1) == {1, 2, 10, 11}
    assert docs1[1].lines_removed == 0
    # 'common footer' normalizes equal to wave-1's 'Common Footer 2024!'
    assert docs1[10].clean_text == "unique two here"
    assert docs1[10].lines_removed == 2
    assert docs1[11].clean_text == "repeated inside\nfresh line stays"

    _run_line_wave(spark, tmp_path, waves[1], "w2_replay", kept_dir)
    docs2 = {r.doc_id: r for r in spark.read.parquet(f"{kept_dir}/docs").collect()}
    assert {d: r.clean_text for d, r in docs2.items()} == {
        d: r.clean_text for d, r in docs1.items()
    }

    full = spark.createDataFrame(
        [r for w in waves for r in w], "doc_id long, text string"
    )
    twin = {r.doc_id: r for r in line_dedup(full).collect()}
    assert {
        d: (r.clean_text, r.lines_total, r.lines_kept, r.dup_line_frac)
        for d, r in docs2.items()
    } == {
        d: (r.clean_text, r.lines_total, r.lines_kept, r.dup_line_frac)
        for d, r in twin.items()
    }


def test_streaming_line_dedup_fully_deduped_doc_is_empty_shell(spark, tmp_path):
    kept_dir = str(tmp_path / "ld_kept2")
    _run_line_wave(spark, tmp_path, [(1, "the only line here")], "a", kept_dir)
    _run_line_wave(spark, tmp_path, [(2, "the only line here")], "b", kept_dir)
    docs = {r.doc_id: r for r in spark.read.parquet(f"{kept_dir}/docs").collect()}
    assert docs[2].clean_text == "" and docs[2].lines_kept == 0
    assert docs[2].dup_line_frac == 1.0


def test_streaming_line_dedup_partial_docs_commit_replay(spark, tmp_path):
    """Crash simulation: the docs append committed the DUP doc but not
    its same-epoch OWNER. The replay must re-derive full-epoch
    decisions (owner keeps the shared line) instead of treating the
    epoch's own state rows as prior corpus — the failure mode where a
    duplicated line vanishes from every document."""
    kept_dir = str(tmp_path / "ld_partial")
    rows = [
        (10, "shared here line\nunique ten stays"),
        (11, "shared here line\nunique eleven stays"),
    ]
    _run_line_wave(spark, tmp_path, rows, "full", kept_dir)
    docs = spark.read.parquet(f"{kept_dir}/docs")
    assert {r.doc_id: r.clean_text for r in docs.collect()}[10].startswith(
        "shared here line"
    )
    # simulate the partial commit: only doc 11 (the dup) finalized
    import shutil

    only11 = docs.filter("doc_id = 11").collect()
    shutil.rmtree(f"{kept_dir}/docs")
    spark.createDataFrame(only11, docs.schema).write.parquet(f"{kept_dir}/docs")

    _run_line_wave(spark, tmp_path, rows, "replay", kept_dir)
    got = {
        r.doc_id: r.clean_text
        for r in spark.read.parquet(f"{kept_dir}/docs").collect()
    }
    assert got[10] == "shared here line\nunique ten stays"  # owner keeps it
    assert got[11] == "unique eleven stays"  # dup stays deduped


def test_streaming_substring_dedup_partial_docs_commit_replay(spark, tmp_path):
    """Same crash simulation for the ExactSubstr gate: the owner of a
    duplicated >=k-token run must survive a replay in which only the
    dup was finalized."""
    kept_dir = str(tmp_path / "ss_partial")
    shared = "one two three four five"
    rows = [
        (10, shared + " tail ten"),
        (11, shared + " tail eleven"),
    ]
    _run_substr_wave(spark, tmp_path, rows, "full", kept_dir, k=4)
    docs = spark.read.parquet(f"{kept_dir}/docs")
    first = {r.doc_id: r.text for r in docs.collect()}
    assert first[10] == shared + " tail ten"  # owner untouched
    import shutil

    only11 = docs.filter("doc_id = 11").collect()
    shutil.rmtree(f"{kept_dir}/docs")
    spark.createDataFrame(only11, docs.schema).write.parquet(f"{kept_dir}/docs")

    _run_substr_wave(spark, tmp_path, rows, "replay", kept_dir, k=4)
    got = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{kept_dir}/docs").collect()
    }
    # the replay reconstructs exactly the original outcome: owner's
    # run survives, the dup's cut text is unchanged
    assert got == first


# ------------------------------ streaming perceptual-hash gate


def _run_phash_wave(spark, tmp_path, rows, tag, kept_dir):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    src = str(tmp_path / f"ph_src_{tag}")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = SD.streaming_phash_dedup(
        stream, kept_dir, str(tmp_path / f"ph_ck_{tag}"), max_hamming=8
    )
    q.awaitTermination(120)


def test_streaming_phash_dedup_admits_rejects_replays(spark, tmp_path):
    import random

    random.seed(21)
    base = bytes(random.randrange(256) for _ in range(4096))
    tweak = bytearray(base)
    tweak[50] ^= 0xFF  # perceptually identical re-fetch
    other = bytes(random.randrange(256) for _ in range(4096))
    third = bytes(random.randrange(256) for _ in range(4096))

    kept_dir = str(tmp_path / "ph_kept")
    # wave 1: base + an internal near-dup (min id wins) + novel
    _run_phash_wave(
        spark, tmp_path,
        [(1, base), (2, bytes(tweak)), (3, other)], "w1", kept_dir,
    )
    kept1 = sorted(r.id for r in spark.read.parquet(f"{kept_dir}/media").collect())
    assert kept1 == [1, 3]  # 2 collapsed into 1 batch-internally

    # wave 2: cross-batch near-dup of kept 1 rejected; novel admitted
    _run_phash_wave(spark, tmp_path, [(10, bytes(tweak)), (11, third)], "w2", kept_dir)
    kept2 = sorted(r.id for r in spark.read.parquet(f"{kept_dir}/media").collect())
    assert kept2 == [1, 3, 11]

    # fresh-checkpoint replay of wave 2: nothing changes
    _run_phash_wave(spark, tmp_path, [(10, bytes(tweak)), (11, third)], "w2r", kept_dir)
    kept3 = sorted(r.id for r in spark.read.parquet(f"{kept_dir}/media").collect())
    assert kept3 == kept2

    # streaming == batch on tight clusters: batch pairs + min-id apply
    from customkb_spark.operators.dedup import connected_components
    from customkb_spark.operators.multimodal import phash_near_duplicates

    all_rows = [(1, base), (2, bytes(tweak)), (3, other), (10, bytes(tweak)), (11, third)]
    media = spark.createDataFrame(
        [(i, "image", c) for i, c in all_rows],
        "media_id long, kind string, content binary",
    )
    pairs = phash_near_duplicates(media, max_hamming=8)
    comps = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    batch_kept = sorted(
        i for i, _ in all_rows if comps.get(i, i) == i
    )
    assert kept3 == batch_kept


def test_chained_streaming_gates_equal_batch_pipeline(spark, tmp_path):
    """VERDICT r5 #7: the full curation chain — exact → line → substr →
    minhash → semantic — composed as five streaming gates, each reading
    the previous gate's standing output as its file-source stream, over
    TWO waves with cross-wave duplicates at every stage. The final kept
    corpus must equal the batch operators applied in the same order on
    the concatenated corpus; a worst-case replay (fresh checkpoint,
    whole input re-read) at the mid-chain substring gate appends
    nothing.

    Corpus design notes: the chain order constrains what each later
    gate can still see — exact dups must be cross-wave (within-batch
    dropDuplicates keeps an arbitrary row, the batch twin keeps the min
    id), shared LINES are 5 tokens so they never trip the k=12
    substring gate, the substring phrase is 12 tokens, and the minhash
    pair shares only 8-token runs (< k) via a unique token inserted
    every 8 positions — J = 0.56, surfaced by 8x2 LSH banding (4x4
    would see it with p≈0.34 only). ccnet_line_norm strips non-letters,
    so every synthetic token is letters-only (digit-suffixed tokens
    would alias whole lines together)."""
    import string

    import numpy as np

    from customkb_spark.operators import curation as CU
    from customkb_spark.operators import dedup as D
    from customkb_spark.operators.dedup import content_hash

    K, BANDS = 12, 8
    LINES = {
        "A": "alpha bravo charlie delta echo",
        "B": "foxtrot golf hotel india juliet",
        "E": "uniform victor whiskey xray yankee",
        "F": "zulu apple banana cherry date",
        "G": "elder fig grape honey iris",
        "H": "jasmine kale lemon mango nectar",
    }
    P = "shared run tokens quite long enough to trip the substring gate now"
    lets = string.ascii_lowercase
    d2_toks = ["w" + lets[i // 26] + lets[i % 26] for i in range(27)]
    d2 = "\n".join(" ".join(d2_toks[i : i + 9]) for i in range(0, 27, 9))
    d13_toks = []
    for i, t in enumerate(d2_toks):
        d13_toks.append(t)
        if (i + 1) % 8 == 0:
            d13_toks.append("ins" + lets[i % 26])
    d13 = "\n".join(
        " ".join(d13_toks[i : i + 10]) for i in range(0, len(d13_toks), 10)
    )
    waves = [
        [
            (1, LINES["A"] + "\n" + LINES["B"], "2024-01-01 00:00:01"),
            (2, d2, "2024-01-01 00:00:02"),
            (3, LINES["A"] + "\n" + LINES["E"], "2024-01-01 00:00:03"),
            (4, "one two " + P + " three four\n" + LINES["F"], "2024-01-01 00:00:04"),
        ],
        [
            (10, LINES["A"] + "\n" + LINES["B"], "2024-01-01 00:10:01"),  # exact dup of 1
            (11, LINES["B"] + "\n" + LINES["G"], "2024-01-01 00:10:02"),  # line dup vs 1
            (12, "five six " + P + " seven eight\n" + LINES["H"], "2024-01-01 00:10:03"),  # substr dup vs 4
            (13, d13, "2024-01-01 00:10:04"),  # minhash near-dup of 2 (J=0.56)
            (14, "totally novel closing document with singular vocabulary entries", "2024-01-01 00:10:05"),  # semantic dup of 1
        ],
    ]

    # deterministic embeddings: {1,14} tight pair in cell 0 (1 arrives
    # first AND is the low-centroid-sim member, so greedy first-wins ==
    # batch low_centroid_sim); everyone else >= 25 degrees apart
    import math

    def v0(deg):
        r = math.radians(deg)
        return [math.cos(r), 0.0, math.sin(r), 0.0]

    def v1(deg):
        r = math.radians(deg)
        return [0.0, math.cos(r), 0.0, math.sin(r)]

    cents = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    emb_rows = [
        (1, v0(20)), (2, v0(70)), (3, v1(0)), (4, v1(25)),
        (10, v0(45)), (11, v1(50)), (12, v1(75)), (13, v0(88)),
        (14, v0(18)),
    ]
    emb_static = spark.createDataFrame(emb_rows, "id long, embedding array<double>")

    base = tmp_path / "chain"
    src = str(base / "src")
    d1 = str(base / "d1")
    kept2, kept3, kept4, kept5 = (str(base / f"kept{i}") for i in range(2, 6))

    def run_chain(wave, tag, substr_ckpt=None):
        _docs(spark, wave).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        q = (
            SD.streaming_dedup_exact(
                spark.readStream.schema(schema).parquet(src), watermark="1 hour"
            )
            .writeStream.format("parquet")
            .option("path", d1)
            .option("checkpointLocation", str(base / "ck1"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        s2in = spark.readStream.schema(spark.read.parquet(d1).schema).parquet(d1)
        SD.streaming_line_dedup(s2in, kept2, str(base / "ck2")).awaitTermination(120)
        s3in = spark.readStream.schema(
            spark.read.parquet(f"{kept2}/docs").schema
        ).parquet(f"{kept2}/docs")
        SD.streaming_substring_dedup(
            s3in, kept3, substr_ckpt or str(base / "ck3"),
            text_col="clean_text", k=K,
        ).awaitTermination(120)
        s4in = spark.readStream.schema(
            spark.read.parquet(f"{kept3}/docs").schema
        ).parquet(f"{kept3}/docs")
        SD.streaming_minhash_dedup(
            s4in, kept4, str(base / "ck4"),
            id_col="doc_id", text_col="clean_text",
            num_hashes=16, bands=BANDS, shingle_n=3, threshold=0.5,
        ).awaitTermination(120)
        s5raw = spark.readStream.schema(
            spark.read.parquet(f"{kept4}/docs").schema
        ).parquet(f"{kept4}/docs")
        s5in = s5raw.join(emb_static, "id").select(
            F.col("id").alias("vec_id"), "embedding"
        )
        SD.streaming_semantic_dedup(
            s5in, kept5, str(base / "ck5"), cents, threshold=0.95
        ).awaitTermination(120)

    run_chain(waves[0], "w1")
    run_chain(waves[1], "w2")

    stream_kept = sorted(r.vec_id for r in spark.read.parquet(kept5).collect())
    stream_texts = {
        r.id: r.text for r in spark.read.parquet(f"{kept4}/docs").collect()
    }

    # worst-case mid-chain replay: fresh substr checkpoint re-reads the
    # ENTIRE kept2/docs history; every id is finalized, so it must
    # append nothing (and nothing new flows downstream)
    before = sorted(
        (r.doc_id, r.clean_text)
        for r in spark.read.parquet(f"{kept3}/docs").collect()
    )
    s3in = spark.readStream.schema(
        spark.read.parquet(f"{kept2}/docs").schema
    ).parquet(f"{kept2}/docs")
    SD.streaming_substring_dedup(
        s3in, kept3, str(base / "ck3_replay"), text_col="clean_text", k=K
    ).awaitTermination(120)
    after = sorted(
        (r.doc_id, r.clean_text)
        for r in spark.read.parquet(f"{kept3}/docs").collect()
    )
    assert after == before

    # batch twin: the same five operators in the same order on the
    # concatenated corpus
    full = spark.createDataFrame(
        [(d, t) for w in waves for d, t, _ in w], "doc_id long, text string"
    )
    h = full.select("doc_id", "text", content_hash(F.col("text")).alias("h"))
    first = h.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    s1 = h.join(first, "h").filter("doc_id = keep_id").select("doc_id", "text")
    s2 = CU.line_dedup(s1).select("doc_id", F.col("clean_text").alias("text"))
    s3 = D.exact_substring_dedup(s2, k=K).select("doc_id", "text")
    pairs = D.minhash_lsh_duplicates(s3, "doc_id", "text", 16, BANDS, 3, 0.5)
    losers = (
        D.connected_components(pairs)
        .filter("id != cluster_id")
        .select(F.col("id").alias("doc_id"))
    )
    s4 = s3.join(losers, "doc_id", "left_anti")
    emb = s4.join(
        emb_static.withColumnRenamed("id", "doc_id"), "doc_id"
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    marks = D.semdedup_apply(
        emb, cents, "vec_id", "embedding", threshold=0.95,
        keep="low_centroid_sim",
    )
    batch_kept = sorted(r.id for r in marks.filter("kept").collect())
    batch_texts = {r.doc_id: r.text for r in s4.collect()}

    assert stream_kept == batch_kept == [1, 2, 3, 4, 11, 12]
    # the texts the chain shipped match the batch pipeline's rewrites
    # (doc 3/11 lost a line, doc 12 lost the 12-token phrase)
    assert {i: stream_texts[i] for i in stream_kept} == {
        i: batch_texts[i] for i in batch_kept
    }


def test_streaming_exact_dedup_permanent_across_drains(spark, tmp_path):
    """The standing-state exact gate (r8, ADVICE r7): a duplicate
    arriving in a LATER drain — arbitrarily long after the original —
    is still rejected, because state is a parquet table, not a
    watermark-bounded store. Also: within-batch first-arrival (min id)
    wins, and a replayed epoch is idempotent."""
    src = str(tmp_path / "src")
    kept = str(tmp_path / "kept")
    ck = str(tmp_path / "ck")

    def drain(rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "append"
        ).parquet(src)
        s = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        SD.streaming_exact_dedup(s, kept, ck).awaitTermination(120)

    # wave 1: 1 wins over its ws-normalized twin 2; 3 unique
    drain([(1, "alpha beta gamma"), (2, "alpha   beta\tgamma"), (3, "unique one")])
    kept1 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{kept}/docs").collect()
    )
    assert kept1 == [1, 3]
    # wave 2 (a separate drain — no watermark clock involved): exact
    # copy of doc 1 rejected, fresh doc admitted
    drain([(10, "alpha beta gamma"), (11, "brand new text")])
    kept2 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{kept}/docs").collect()
    )
    assert kept2 == [1, 3, 11]
    # standing hash state matches the admitted docs
    hashes = spark.read.parquet(f"{kept}/hashes")
    assert sorted(r["src_id"] for r in hashes.collect()) == [1, 3, 11]


def test_streaming_exact_dedup_partial_commit_replay(spark, tmp_path):
    """Crash between the hashes append and the docs append: the replay
    must still admit the batch (self-exclusion on src_id), and must not
    double-write docs that DID land."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    kept = str(tmp_path / "kept")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    ).write.parquet(src)
    # simulate the partial commit by hand: hashes row for doc 1 exists,
    # docs row does not
    from customkb_spark.operators.dedup import content_hash

    pre = (
        spark.read.parquet(src)
        .filter(F.col("doc_id") == 1)
        .select(
            F.concat(
                F.lit("k"), F.substring(content_hash(F.col("text")), 1, 2)
            ).alias("kp"),
            content_hash(F.col("text")).alias("thash"),
            F.col("doc_id").alias("src_id"),
        )
    )
    pre.write.partitionBy("kp").parquet(f"{kept}/hashes")
    s = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    SD.streaming_exact_dedup(s, kept, str(tmp_path / "ck")).awaitTermination(120)
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{kept}/docs").collect()
    )
    assert kept_ids == [1, 2]  # doc 1 NOT rejected by its own orphan hash


# ------------------------------ r9: commit ledger + pruned doc probes


def test_exact_gate_probes_pruned_and_ledger_short_circuits(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 #1 done-gate: (a) every finalized-docs membership
    probe carries a bounded dp pruning set — never a whole-table scan;
    (b) a same-checkpoint replay of a committed epoch is detected by
    the O(1) ledger file probe and performs ZERO finalized-docs reads."""
    import os as _os

    calls = []
    real = SD._read_docs_pruned

    def spy(spark_, path, dps):
        calls.append((path, None if dps is None else list(dps)))
        return real(spark_, path, dps)

    monkeypatch.setattr(SD, "_read_docs_pruned", spy)

    src = str(tmp_path / "src")
    kept = str(tmp_path / "kept")
    ck = str(tmp_path / "ck")

    def drain(rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "append"
        ).parquet(src)
        s = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        SD.streaming_exact_dedup(s, kept, ck).awaitTermination(120)

    drain([(1, "alpha"), (2, "beta")])
    # ids far apart in the keyspace: the probe set stays the BATCH's
    # own buckets, not wave 1's
    drain([(1 << 20, "alpha"), ((1 << 20) + 1, "gamma")])
    assert calls, "second wave must probe the finalized docs"
    assert all(dps is not None and len(dps) <= 8 for _, dps in calls)
    assert len(_os.listdir(_os.path.join(kept, "_epochs"))) == 2

    # same-checkpoint crash replay: wipe Spark's own commit record for
    # the last epoch so the restart re-delivers it; the gate's ledger
    # short-circuits before any state read
    commits = sorted(
        c for c in _os.listdir(_os.path.join(ck, "commits"))
        if not c.startswith(".")
    )
    _os.remove(_os.path.join(ck, "commits", commits[-1]))
    crc = _os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if _os.path.exists(crc):
        _os.remove(crc)
    before = sorted(
        r.doc_id for r in spark.read.parquet(f"{kept}/docs").collect()
    )
    calls.clear()
    s = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    SD.streaming_exact_dedup(s, kept, ck).awaitTermination(120)
    assert calls == []  # ledger hit: zero finalized-docs reads
    after = sorted(
        r.doc_id for r in spark.read.parquet(f"{kept}/docs").collect()
    )
    assert after == before == [1, 2, (1 << 20) + 1]


def test_read_docs_pruned_uses_partition_filters(spark, tmp_path):
    """The pruned probe must reach the scan as PartitionFilters (files
    outside the batch's dp buckets are never opened), and dp values
    must partition contiguous id ranges together."""
    import contextlib
    import io

    p = str(tmp_path / "docs")
    df = spark.range(0, 200000, 1).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    df = df.withColumn(
        "dp", SD._doc_part_key(F.col("doc_id"), df.schema["doc_id"].dataType)
    )
    df.write.partitionBy("dp").parquet(p)
    assert sorted(
        d for d in __import__("os").listdir(p) if d.startswith("dp=")
    ) == ["dp=r0", "dp=r1", "dp=r2", "dp=r3"]

    pruned = SD._read_docs_pruned(spark, p, ["r1"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "dp" in plan.split("PartitionFilters", 1)[1][:200]
    assert pruned.count() == 65536  # exactly one bucket's rows


def test_batch_doc_parts_types_and_cap(spark):
    """dp derivation: integral ids → range buckets (locality), string
    ids → md5 prefix; a pathological spread past the cap disables
    pruning instead of shipping a useless thousand-value IN-list."""
    ints = spark.createDataFrame(
        [(0,), (65535,), (65536,), (-1,)], "doc_id long"
    )
    assert sorted(SD._batch_doc_parts(ints, "doc_id")) == ["r-1", "r0", "r1"]
    strs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    dps = SD._batch_doc_parts(strs, "doc_id")
    assert len(dps) == 2 and all(d.startswith("h") and len(d) == 3 for d in dps)
    wide = spark.range(0, 600 * 65536, 65536).select(
        F.col("id").alias("doc_id")
    )
    assert SD._batch_doc_parts(wide, "doc_id") is None
