"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is native Column expressions (JVM-side, whole-stage
codegen); no python UDFs. Each operator is designed to be SQL-reproducible so
the DuckDB oracle can verify it value-for-value.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language-marker stopwords: occurrences of " word " in the text.
# literal, SQL-reproducible heuristic (no external models)
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
}


def _occurrences(text: Column, token: str) -> Column:
    """Number of non-overlapping occurrences of ' token ' in ' text '."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return F.size(F.split(padded, f" {token} ")) - F.lit(1)


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/word statistics used for quality filtering.

    Assumes single-space tokenization (the synthetic corpus guarantees it);
    all expressions have exact DuckDB equivalents.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    words = F.split(text, " ")
    n_words = F.size(words)
    non_space = n_chars - (n_words - F.lit(1))
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn(
            "avg_word_len",
            F.round(non_space.cast("double") / n_words, 4),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                (n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))).cast("double")
                / n_chars,
                4,
            ),
        )
    )


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + regex ("BPE-ish" alnum-run) token counts."""
    text = F.col(text_col)
    return df.withColumn(
        "ws_tokens", F.size(F.split(text, " ")).cast("long")
    ).withColumn(
        "re_tokens",
        F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), 0)).cast("long"),
    )


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stopword-count language ID (n-gram-heuristic class).

    Scores each language by marker-word occurrences; ties break in fixed
    en>de>fr>es order; zero hits → 'und' (undetermined).
    """
    text = F.col(text_col)
    scores = {
        lang: sum([_occurrences(text, w) for w in words], F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in ["en", "de", "fr", "es"]:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    out = df
    for lang, score in scores.items():
        out = out.withColumn(f"score_{lang}", score.cast("long"))
    return out.withColumn("lang_pred", expr)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def tokens_with_positions(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Explode text into (id, pos, word) rows — shared shingling primitive."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle).

    Built with a lateral transform over the word array — one projection, no
    self-joins; identical results to a windowed lead() formulation in SQL.
    """
    # bind the split to a REAL column first: higher-order lambdas get no
    # common-subexpression elimination, so an inline `split(text)` would be
    # re-evaluated per array element (O(words²) per doc — measured 4×
    # slower). CollapseProject keeps the alias because it's referenced more
    # than once and split() isn't cheap.
    bound = df.withColumn("_words", F.split(F.col(text_col), " "))
    words = F.col("_words")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(words) - F.lit(n)),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    # dedup INSIDE the row (a document's shingles all live in its own array)
    # — semantically identical to a global .distinct() but zero-shuffle, and
    # the jaccard operators reference this frame several times (sizes,
    # candidates, verification): a shuffling distinct here would be
    # recomputed per consumer (column pruning defeats ReuseExchange)
    return (
        bound.where(F.size(words) >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def word_shingle_counts(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, n_sh) distinct-shingle count per document — computed array-side
    in one zero-shuffle projection (the groupBy-count over the exploded
    shingle frame costs a shuffle AND a full shingle recomputation)."""
    bound = df.withColumn("_words", F.split(F.col(text_col), " "))
    words = F.col("_words")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(words) - F.lit(n)),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return bound.where(F.size(words) >= n).select(
        F.col(id_col),
        F.size(F.array_distinct(shingles)).cast("long").alias("n_sh"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, word, tf, score, rank).

    tf = raw term count in the doc; idf = ln((N+1)/(df+1)) + 1 (smoothed);
    score = round(tf·idf, 4); ties rank alphabetically. Two shuffles
    ((id, word) count → per-doc window); the document frequency side is a
    word-keyed aggregation joined back by word. SQL-reproducible for the
    DuckDB oracle.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    tf = tok.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("word").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), "word", "tf", "score", F.col("rank").cast("long").alias("rank"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_tokens: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split documents into training-sized chunks with token overlap:
    (id, chunk_id, chunk_text, n_tokens).

    Chunk k covers tokens [k·stride, k·stride + max_tokens) with
    stride = max_tokens − overlap; the last chunk may be short; documents
    shorter than max_tokens yield one chunk. Zero-shuffle (array math over
    the bound word column) and SQL-reproducible for the oracle."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    bound = df.withColumn("_words", F.split(F.col(text_col), " "))
    words = F.col("_words")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(words) - F.lit(overlap)).cast("double") / stride).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(words, k * stride + 1, max_tokens)).alias("chunk_text"),
            F.least(
                F.lit(max_tokens), F.size(words) - k * stride
            ).cast("long").alias("n_tokens"),
        ),
    )
    return bound.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        F.col(id_col),
        F.col("_c.chunk_id"),
        F.col("_c.chunk_text"),
        F.col("_c.n_tokens"),
    )
