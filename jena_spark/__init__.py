"""jena_spark — a PySpark-native knowledge-graph construction engine.

Re-implements the query/data-processing capabilities of Apache Jena's RIOT
parsing + TDB2 storage pipeline as idiomatic Spark: vectorized Arrow UDF
parsers, a dictionary-encoded node table, SPO/POS/OSP-sorted materialized
graph tables, and MinHash-LSH entity linking.  See SURVEY.md for the full
blueprint and per-module citations into the reference.
"""

__version__ = "0.1.0"
