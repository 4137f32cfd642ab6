"""customkb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the CustomKB reference (a single-node RAG
knowledgebase engine; see SURVEY.md).

Everything here is expressed Spark-first: DataFrame/SQL plans that Catalyst
optimizes (predicate pushdown, broadcast joins, partial aggregation), with
Pandas UDFs only where built-in functions genuinely can't express the
semantics (model inference, heavy NLP).

Layout:
  session     SparkSession factory tuned for local testing / cluster scale
  config      layered KB config (env > cfg > defaults), mirroring the
              reference's config sections (reference: config/models.py)
  schema      canonical chunk-table and sidecar-table schemas
  functions/  scalar expression library (text, hashing, vectors)
  operators/  relational + retrieval operators (top-k, BM25, fusion,
              range join, dedup, sessionize, windows)
  ingest/     file→chunks pipeline (chunking, file types, language)
  embedding/  deterministic stub embedder, cache join, IVF ANN index
  plans/      end-to-end query pipelines (hybrid search, formatters)
  streaming/  incremental (Structured Streaming) variants
"""

__version__ = "0.1.0"

from customkb_spark.session import get_spark  # noqa: F401
