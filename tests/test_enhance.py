"""Query enhancement: normalize/spell/synonym determinism + batch UDF."""

from customkb_spark.functions import enhance as EN


def test_normalize():
    assert EN.normalize_query_text("what’s   “this”??") == "what's \"this\"?"


def test_spell_collapse():
    assert EN.correct_spelling("realllly goooood") == "really good"
    assert EN.correct_spelling("good") == "good"  # doubles untouched


def test_synonym_expansion_groups():
    out = EN.expand_synonyms("running tables")
    assert out.startswith("(running OR run OR")
    assert "(tables OR table)" in out
    assert "(queries OR query)" in EN.expand_synonyms("queries")
    # words under 4 chars stay untouched
    assert EN.expand_synonyms("a cat") == "a cat"


def test_enhance_order_and_terms():
    out = EN.enhance_query("queryyyy   tables")
    assert "OR" in out and "   " not in out
    terms = EN.expanded_terms(out)
    assert "tables" in terms and "table" in terms and "or" not in terms


def test_enhance_queries_batch(spark):
    df = spark.createDataFrame([("running fast",), (None,)], ["query"])
    rows = {r["query"]: r["enhanced"] for r in EN.enhance_queries(df).collect()}
    assert rows["running fast"] == EN.enhance_query("running fast")
    assert rows[None] is None
