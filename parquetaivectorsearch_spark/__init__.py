"""parquetaivectorsearch_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``bartczernicki/ParquetAIVectorSearch`` (a .NET parquet → tokenize → HNSW →
KNN pipeline; see /root/reference/Program.cs), extended with the
LLM-data-pipeline operators a 100 TB training-data pipeline needs:
deduplication, similarity search/join, text analysis, multimodal columns,
and streaming window aggregation.

Design principles (SURVEY.md §7):
- DataFrame/SQL first: declare logical plans, let Catalyst/Tungsten pick
  physical strategies (pushdown, pruning, broadcast, AQE).
- Python only on the slow path, and then Arrow-batched (pandas UDF /
  mapInPandas), never row-at-a-time.
- No ``collect()`` inside any operator path; scalar query parameters travel
  as broadcast single-row DataFrames or literals.
- Explicit ids everywhere (``vec_id``/``doc_id``): never rely on row order
  (the reference binds vectors by list position, Program.cs:106-107,256 —
  that contract does not survive distribution).
"""

__version__ = "0.1.0"
