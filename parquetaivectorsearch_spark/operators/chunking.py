"""Document chunking + TF-IDF — text-pipeline operators upstream of
embedding (chunk → embed → index is the standard RAG/train-data flow; the
reference embeds whole title+text rows, Program.cs:79-87).

Both are pure Catalyst: chunk boundaries come from a `sequence` over the
text length (explode → one row per chunk, no UDF), TF-IDF is two
aggregations + a broadcast-able join of per-term document frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions.text import words


def chunk_documents(docs: DataFrame, size: int = 200, overlap: int = 50,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document into fixed-size character chunks with overlap
    (stride = size - overlap). Output: (doc_id, chunk_id, chunk_text,
    chunk_chars); empty docs produce no chunks.

    Chunk starts are 1 + k·stride for k = 0 .. ceil((len-size)/stride)
    capped so the last chunk always reaches the end of the text.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    t = F.col(text_col)
    n = F.length(t)
    # number of chunks: 1 + max(0, ceil((n - size) / stride))
    extra = F.greatest(F.lit(0), F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int"))
    starts = F.sequence(F.lit(0), extra)
    return (
        docs.filter(n > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.transform(starts, lambda k: F.substring(t, k * stride + 1, size))
            ).alias("chunk_id", "chunk_text"),
        )
        .withColumn("chunk_chars", F.length("chunk_text").cast("int"))
    )


def tf_idf(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           round_to: int = 6) -> DataFrame:
    """Per (doc, term) TF-IDF over whitespace terms:
    tf = term count in doc; idf = ln((N + 1) / (df + 1)) + 1 (smoothed,
    the scikit-learn convention); score = tf · idf, rounded.

    Shape: one explode + one hash aggregation; df (documents containing
    the term) is a count window over the term partition of the SAME tf
    output — a groupBy(term)-then-join-back re-derives the whole
    explode+agg pipeline (observed: 2 extra corpus scans, no
    ReusedExchange). n_docs is an id-only scan (column-pruned, no
    explode). Output: (doc_id, term, tf, df, tfidf).
    """
    from pyspark.sql.window import Window

    terms = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .join(F.broadcast(n_docs))
        .select(
            "doc_id", "term", "tf", "df",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                round_to,
            ).alias("tfidf"),
        )
    )
