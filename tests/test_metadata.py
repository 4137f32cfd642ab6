"""F4 metadata extraction + F2 enhanced clean (placeholder preserve)."""

from pyspark.sql import functions as F

from customkb_spark.ingest import metadata as MD


def test_heading_and_sections(spark):
    rows = [
        (1, "# Title\nbody text"),
        (2, "Plain first line\nmore"),
        (3, "```\ncode here\n```"),
        (4, "- item one\n- item two"),
        (5, "1. first\n2. second"),
        (6, "| a | b |\n| 1 | 2 |"),
        (7, "<div>hello</div>"),
        (8, "Introduction to the topic"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r["m"] for r in df.select("id", MD.chunk_metadata("text").alias("m")).collect()}
    assert out[1]["heading"] == "Title"
    assert out[2]["heading"] == "Plain first line"
    assert out[3]["section_type"] == "code_block"
    assert out[4]["section_type"] == "bullet_list"
    assert out[5]["section_type"] == "numbered_list"
    assert out[6]["section_type"] == "table"
    assert out[7]["section_type"] == "html"
    assert out[8]["document_section"] == "introduction"
    assert out[1]["word_count"] == 4


def test_entities_titlecase_spans(spark):
    df = spark.createDataFrame(
        [(1, "Alice Smith met Bob in New York City yesterday")], ["id", "text"]
    )
    ents = df.select(MD.extract_entities("text").alias("e")).first()["e"]
    assert "Alice Smith" in ents and "New York City" in ents
    assert "yesterday" not in ents


def test_enhanced_clean_preserves_urls():
    out = MD._enhanced_clean_one(
        "The <b>Spark</b> docs at https://spark.apache.org are GREAT!!"
    )
    assert "https://spark.apache.org" in out
    assert "<b>" not in out and "the" not in out.split()
    assert "spark" in out and "great" in out


def test_enhanced_clean_udf(spark):
    df = spark.createDataFrame([("Contact a@b.com now",), (None,)], ["text"])
    rows = [r["embedtext"] for r in MD.enhanced_clean_text(df, "text").collect()]
    assert rows[0] is not None and "a@b.com" in rows[0]
    assert rows[1] is None


def test_with_chunk_metadata_schema(spark, documents):
    out = MD.with_chunk_metadata(documents.limit(3), "text")
    fields = {f.name for f in out.schema["metadata"].dataType.fields}
    assert fields == {
        "heading", "section_type", "document_section",
        "char_length", "word_count", "entities",
    }
