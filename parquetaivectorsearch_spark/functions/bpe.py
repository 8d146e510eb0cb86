"""True byte-pair-encoding tokenizer — training and apply-merges encoding.

Closes the reference's SharpToken cl100k gap (Program.cs:40,80 — encode +
.Count) ALGORITHMICALLY: tiktoken and its downloadable merge tables are not
in this container, so the merge table is TRAINED ON THE CORPUS (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units", §3) and then applied with the GPT-2/tiktoken apply-merges encoder
(repeatedly merge the lowest-rank adjacent pair). Same algorithm as the
reference's tokenizer, different (corpus-fit) table.

Scale split — the design that matters at 100 TB:

- **pre-tokenize + piece-frequency table: distributed.** The cl100k-style
  regex splits each document into pieces (pandas UDF, Arrow-batched); one
  explode + hash-agg (partial combine map-side) produces the distinct-piece
  frequency table. Corpus size affects ONLY this pass.
- **merge training: driver-side over the BOUNDED frequency table.** BPE
  training needs the piece→freq map, whose size is vocabulary-shaped (heavy
  tail truncated at `max_vocab` by frequency) — the same bounded-driver
  pattern as IVF's k-means sample (operators/ann.py). This is how real
  trainers (SentencePiece, HuggingFace tokenizers) work: they train on the
  compacted word-count table, never on the raw corpus.
- **encoding: Arrow-batched pandas UDF.** The ranked merge table (a few
  hundred to ~100k pairs) travels to workers inside the UDF closure; each
  batch memoizes distinct pieces so repeated words are encoded once.

Determinism: merge selection breaks count ties on the lexicographically
smallest pair, so the same corpus always yields the same table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquetaivectorsearch_spark.functions.text import _BPE_ISH


def piece_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct pre-tokenizer pieces with corpus frequencies — the compact
    table BPE trains on. One Arrow UDF pass + one hash-agg shuffle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.StringType()))
    def pieces(texts):
        return texts.map(lambda t: _BPE_ISH.findall(t) if t else [])

    return (
        docs.select(F.explode(pieces(F.col(text_col))).alias("piece"))
        .groupBy("piece")
        .agg(F.count("*").alias("freq"))
    )


def train_merges(docs: DataFrame, n_merges: int = 200,
                 max_vocab: int = 50_000,
                 text_col: str = "text") -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus (Sennrich §3: repeatedly
    merge the most frequent adjacent symbol pair). The distributed part is
    piece_freq; the loop runs on the driver over ≤ max_vocab pieces."""
    wf = (
        piece_freq(docs, text_col)
        .orderBy(F.desc("freq"), "piece")  # plans as TakeOrdered, not a sort
        .limit(max_vocab)
        .toPandas()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for piece, freq in zip(wf["piece"], wf["freq"]):
        sym = tuple(piece)
        vocab[sym] = vocab.get(sym, 0) + int(freq)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def _encode_piece(piece: str, ranks: dict[tuple[str, str], int],
                  by_rank: list[tuple[str, str]]) -> list[str]:
    """GPT-2/tiktoken apply-merges loop: merge ALL occurrences of the
    lowest-rank adjacent pair until no learned pair remains."""
    parts = list(piece)
    while len(parts) > 1:
        best_rank: int | None = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        a, b = by_rank[best_rank]
        ab = a + b
        out: list[str] = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def _make_udfs(merges: list[tuple[str, str]]):
    """Build the (count, encode) pandas UDFs sharing one closure over the
    ranked merge table. Per-batch memoization: a natural-language batch
    re-uses a small set of distinct pieces."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}
    by_rank = list(merges)

    def encode_text(t: str | None, cache: dict) -> list[str]:
        if not t:
            return []
        toks: list[str] = []
        for piece in _BPE_ISH.findall(t):
            got = cache.get(piece)
            if got is None:
                got = _encode_piece(piece, ranks, by_rank)
                cache[piece] = got
            toks.extend(got)
        return toks

    @pandas_udf(T.IntegerType())
    def count_udf(texts):
        cache: dict = {}
        return texts.map(lambda t: len(encode_text(t, cache))).astype("int32")

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode_udf(texts):
        cache: dict = {}
        return texts.map(lambda t: encode_text(t, cache))

    return count_udf, encode_udf


def bpe_token_count(text: Column | str,
                    merges: list[tuple[str, str]]) -> Column:
    """True-BPE token count of `text` under the given merge table — the
    reference's GetTokenCount (Program.cs:80) with a corpus-fit table."""
    count_udf, _ = _make_udfs(merges)
    return count_udf(F.col(text) if isinstance(text, str) else text)


def bpe_encode(text: Column | str,
               merges: list[tuple[str, str]]) -> Column:
    """Token array (array<string>) — for tests and downstream n-gram work;
    driver-facing queries must project a scalar from it."""
    _, encode_udf = _make_udfs(merges)
    return encode_udf(F.col(text) if isinstance(text, str) else text)
