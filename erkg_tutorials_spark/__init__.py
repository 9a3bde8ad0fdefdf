"""erkg_tutorials_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
``louisguitton/erkg-tutorials`` reference (entity-resolved knowledge
graphs over Senzing/ICIJ data) as idiomatic PySpark, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis)
required for 100 TB scale.

Layout
------
- ``session``    SparkSession builder tuned for scale (AQE, Arrow, ...)
- ``catalog``    load/register the driver's parquet tables
- ``sources``    readers/writers (Senzing JSONL report, TSV, text, JSONL)
- ``operators``  relational operators (filters, joins, aggregates, windows)
- ``functions``  scalar/column function library (descriptions, types, ...)
- ``graph``      k-hop expansion, degrees, PageRank, connected components
- ``text``       tokenize, n-grams, quality scoring, lang-id, fingerprints
- ``dedup``      exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity`` embedding cosine KNN (brute force + LSH-bucketed)
- ``linking``    entity linking: embed, candidates, disambiguation
- ``pipelines``  end-to-end ERKG pipelines (E1/E3 of the reference)
- ``streaming``  Structured Streaming tier over the events table
- ``plans``      the registered query surface (queries + DuckDB oracles)
"""

__version__ = "0.1.0"
