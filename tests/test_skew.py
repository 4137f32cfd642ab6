"""Skew helpers: salted agg equals plain agg; salted join equals plain
join; salt actually spreads hot keys."""

from pyspark.sql import functions as F

from customkb_spark.operators import skew as SK


def _skewed(spark):
    # 90% of rows share one key
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in SK.salted_agg(
            df, ["k"], {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    df = SK.with_salt(_skewed(spark), n_salts=8)
    n_salts_used = (
        df.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_salts_used >= 4  # the hot key fans over multiple reducers


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], ["k", "label"]
    )
    plain = big.join(small, "k").groupBy("k").count()
    salted = SK.salted_join_skewed_left(big, small, "k").groupBy("k").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_agg_rejects_non_mergeable(spark):
    import pytest

    with pytest.raises(ValueError):
        SK.salted_agg(_skewed(spark), ["k"], {"a": ("avg", "v")})


def test_salt_is_deterministic_across_recompute(spark):
    df = _skewed(spark)
    a = SK.with_salt(df, 8)
    b = SK.with_salt(df, 8)  # fresh lineage — same salts required
    joined = (
        a.withColumnRenamed("_salt", "s1")
        .join(b.withColumnRenamed("_salt", "s2"), ["k", "v"], "inner")
        .filter("s1 <> s2")
    )
    assert joined.count() == 0


def test_salted_agg_exact_with_deterministic_salt(spark):
    from pyspark.sql import functions as F

    df = _skewed(spark)
    plain = {
        (r["k"],): (r["n"], r["total"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("total")).collect()
    }
    salted = {
        (r["k"],): (r["n"], r["total"])
        for r in SK.salted_agg(df, ["k"], {"n": ("count", "*"), "total": ("sum", "v")}).collect()
    }
    assert plain == salted
