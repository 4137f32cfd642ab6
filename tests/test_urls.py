"""URL curation battery — normalization canon, registered-domain
heuristic, blocklist/word verdicts, and the two-phase domain cap's
equality with a plain ranking window."""

import pytest
from pyspark.sql import Window, functions as F

from customkb_spark.operators import urls as U


@pytest.fixture(scope="module")
def url_df(spark):
    rows = [
        (0, "https://WWW.Example.com:443/a/b?utm_source=x&b=2&a=1#frag"),
        (1, "http://user:pw@news.example.co.uk:80/path"),
        (2, "https://example.com/a/b?a=1&b=2"),
        (3, "http://10.0.0.1:8080/x?gclid=abc"),
        (4, "https://blog.spam-casino.com/win?ref=aff&q=1"),
        (5, "ftp://files.example.org"),
        (6, "https://sub.deep.example.com.au/page"),
        (7, "example.com/relative"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_normalization_canon(spark, url_df):
    got = {r.doc_id: r for r in U.url_filters(url_df).collect()}
    # tracking dropped, query sorted, fragment gone, host lowered,
    # default port stripped → 0 and 2 collide on the SAME canonical form
    assert got[0].url_normalized == "https://www.example.com/a/b?a=1&b=2"
    assert got[2].url_normalized == "https://example.com/a/b?a=1&b=2"
    # userinfo + default http port stripped; empty path → '/'
    assert got[1].url_normalized == "http://news.example.co.uk/path"
    assert got[5].url_normalized == "ftp://files.example.org/"
    # non-default port kept; tracking-only query vanishes
    assert got[3].url_normalized == "http://10.0.0.1:8080/x"
    assert got[4].url_normalized == "https://blog.spam-casino.com/win?q=1"


def test_registered_domain(spark, url_df):
    got = {r.doc_id: r.domain for r in U.url_filters(url_df).collect()}
    assert got[0] == "example.com"
    assert got[1] == "example.co.uk"       # second-level suffix → 3 labels
    assert got[3] == "10.0.0.1"            # IPv4 passes through
    assert got[4] == "spam-casino.com"
    assert got[6] == "example.com.au"
    assert got[7] == ""                    # scheme-less: no authority


def test_blocklist_and_word_scores(spark, url_df):
    out = {
        r.doc_id: r
        for r in U.url_filters(
            url_df,
            blocked_domains=("spam-casino.com",),
            hard_words=("casino",),
            soft_words={"win": 0.6, "aff": 0.5},
            soft_threshold=1.0,
        ).collect()
    }
    assert out[4].blocked_domain and out[4].hard_word_hit
    assert out[4].soft_score == pytest.approx(1.1)
    assert out[4].soft_blocked and not out[4].url_keep
    assert out[0].url_keep and not out[0].blocked_domain
    # occurrence counting: 'win' twice scores 1.2 ≥ 1.0
    df2 = url_df.sparkSession.createDataFrame(
        [(9, "https://a.com/win/win")], "doc_id long, url string"
    )
    r9 = U.url_filters(df2, soft_words={"win": 0.6}).collect()[0]
    assert r9.soft_score == pytest.approx(1.2) and r9.soft_blocked


def test_verdict_battery_is_shuffle_free(spark, url_df):
    plan = (
        U.url_filters(url_df, soft_words={"win": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_cap_matches_plain_window(spark):
    rows = [
        (i, f"https://{'big.com' if i % 4 else 'small.org'}/p/{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = U.domain_frequency_cap(df, cap=20)
    # the semantic twin: one plain window over the whole domain
    hk = F.md5(F.concat_ws(":", F.lit("domcap-v1"), F.col("doc_id").cast("string")))
    dom = U.registered_domain(U.url_host(F.col("url")))
    w = Window.partitionBy("domain").orderBy("_hk", "doc_id")
    want = (
        df.withColumn("domain", dom)
        .withColumn("_hk", hk)
        .withColumn("dom_rank", F.row_number().over(w).cast("long"))
        .withColumn("kept", F.col("dom_rank") <= 20)
    )
    g = {(r.doc_id, r.dom_rank, r.kept) for r in got.collect()}
    e = {(r.doc_id, r.dom_rank, r.kept) for r in want.collect()}
    assert g == e
    kept_per_dom = (
        got.filter("kept").groupBy("domain").count().collect()
    )
    assert {r["domain"]: r["count"] for r in kept_per_dom} == {
        "big.com": 20, "small.org": 20,
    }


def test_domain_cap_no_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, f"https://one.com/{i}") for i in range(50)],
        "doc_id long, url string",
    )
    plan = (
        U.domain_frequency_cap(df, cap=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # windows partition by (domain, bucket) — never domain alone on the
    # ranking side (the offsets window runs over the TINY counts table)
    assert "SinglePartition" not in plan


def test_psl_snapshot_parses():
    rules = U.load_public_suffix_rules()
    assert "co.uk" in rules["exact"][2]
    assert "com.au" in rules["exact"][2]
    assert "ck" in rules["wild"][1]
    assert "www.ck" in rules["exc"][2]
    # no 1-label exact rules (implicit default covers them)
    assert 1 not in rules["exact"]


def test_registered_domain_psl_cases(spark):
    """PSL algorithm on the vendored snapshot: multi-label TLDs,
    wildcard registries, exception carve-outs, hosts that ARE a public
    suffix (VERDICT r7 #6's done-bar cases)."""
    cases = [
        ("www.example.co.uk", "example.co.uk"),
        ("a.b.example.com.au", "example.com.au"),
        ("shop.example.gob.mx", "example.gob.mx"),
        ("x.example.ac.jp", "example.ac.jp"),
        ("example.com", "example.com"),
        ("deep.sub.example.com", "example.com"),
        # wildcard *.ck: anything.ck is itself a public suffix
        ("www.foo.ck", "www.foo.ck"),          # n = suffix+1 → registrable
        ("a.www.foo.ck", "www.foo.ck"),
        # exception !www.ck: www.ck is registrable despite the wildcard
        ("www.ck", "www.ck"),
        ("a.www.ck", "www.ck"),
        # host IS a public suffix → pass through unchanged
        ("co.uk", "co.uk"),
        ("com", "com"),
        # unknown TLD → implicit default rule (1-label suffix)
        ("example.zz", "example.zz"),
        ("a.b.example.zz", "example.zz"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r[0]
        for r in df.select(U.registered_domain(F.col("host"))).collect()
    ]
    for (host, want), g in zip(cases, got):
        assert g == want, f"{host}: got {g!r}, want {want!r}"
