"""Byte-pair-encoding tokenizer (public GPT-2-style merge ranks).

Training-data budgets, chunk boundaries, and contamination windows are
denominated in *tokenizer* tokens in real LLM pipelines, not whitespace
tokens. This module implements the public BPE algorithm (Sennrich et al.
2016; the same greedy merge loop OpenAI's GPT-2 encoder uses, minus the
byte→unicode remap) with a deterministic merges table trained from an
embedded seed corpus, so every run — Spark, the pure-python reference in
tests, and the DuckDB SQL oracle — produces identical tokenizations.

Equivalence note for the SQL oracle: the encoder merges ONE leftmost
occurrence of the current best-rank pair per step. This is provably
identical to GPT-2's merge-all-occurrences-per-iteration loop: a pair
containing a token created by merge rank r can only have been learned
AFTER r (its element did not exist earlier), so its rank is > r, and the
best-rank pair therefore stays best until all its occurrences are merged.
One-occurrence-per-step is what a recursive SQL CTE can replay.

Spark execution is an Arrow pandas UDF with a per-batch word→count memo —
Zipf makes the memo hit rate ~99% on natural text, so the python cost is
per *distinct* word, not per token. No shuffle anywhere; the UDF is a
per-row map.

Reference parity: the reference repo has no tokenizer; this is a
first-class training-pipeline extension (SURVEY.md §2 additions).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic seed corpus for the default merges table. Plain English
# written for this module (public knowledge only); the trained merges are a
# pure function of this string and N_MERGES.
SEED_CORPUS = """
the quick brown fox jumps over the lazy dog while the query engine scans the
table and sorts the rows by key before the merge join starts the stream of
batches flows through the filter and the window function counts the values
in each group the data frame joins the small table with the big table and
the planner picks a broadcast join when the size is small the spark engine
shuffles the rows on the key and the partition holds the sorted run the
customer orders a part from the supplier and the order lines carry the
quantity and the price the document text is split into words and the tokens
are counted and the chunks overlap the language model trains on the clean
corpus after the duplicates are removed and the quality filter keeps the
good lines the graph stores the nodes and the edges and the labels mark the
kinds the slow scan reads the column values and the fast hash finds the
bucket the value of the row in the stream is added to the running sum in
the window and the agg result is written to the sink
"""

N_MERGES = 200


def train_merges(corpus: str, n_merges: int) -> List[Tuple[str, str]]:
    """Sennrich-style BPE training: repeatedly merge the most frequent
    adjacent symbol pair (ties → lexicographically smallest pair), applied
    over the word-frequency table of the whitespace-split corpus. Fully
    deterministic; stops early when no pair occurs twice."""
    freqs: Dict[Tuple[str, ...], int] = {}
    for w in corpus.split():
        key = tuple(w)
        freqs[key] = freqs.get(key, 0) + 1
    return _train_from_freqs(freqs, n_merges)


def _train_from_freqs(
    freqs: Dict[Tuple[str, ...], int], n_merges: int
) -> List[Tuple[str, str]]:
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Dict[Tuple[str, str], int] = {}
        for sym, n in freqs.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        out: Dict[Tuple[str, ...], int] = {}
        for sym, n in freqs.items():
            new: List[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            key = tuple(new)
            out[key] = out.get(key, 0) + n
        freqs = out
    return merges


@lru_cache(maxsize=1)
def default_merges() -> Tuple[Tuple[str, str], ...]:
    return tuple(train_merges(SEED_CORPUS, N_MERGES))


def train_merges_from_corpus(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES,
    max_vocab: int = 100_000,
) -> List[Tuple[str, str]]:
    """Train a merges table FROM a DataFrame corpus — the way real
    tokenizers are trained (on the word-frequency table, not the raw
    stream). The corpus-wide work is ONE distributed word-count groupBy
    with map-side partials; the merge loop then runs driver-side over that
    table, which is vocabulary-bounded (Heaps' law — ~10⁵–10⁶ distinct
    words even at 100 TB) and further capped at the ``max_vocab`` most
    frequent words (ties → lexicographically smaller word), so driver
    memory is bounded regardless of corpus size. Dropping the long tail of
    hapax words is what production BPE trainers (min_frequency cutoffs) do
    anyway and barely perturbs pair counts.

    Deterministic: the (count desc, word asc) cap order and the Sennrich
    tie-breaks are total orders, so the same corpus yields the same merges
    at any parallelism. Feed the result to :func:`with_bpe_token_count` /
    ``tokenizer="bpe"`` surfaces via ``merges=``, or persist it with
    :func:`save_merges_file`.
    """
    rows = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_vocab)
        .collect()
    )
    freqs = {tuple(r["w"]): r["c"] for r in rows}
    return _train_from_freqs(freqs, n_merges)


def load_merges_file(path: str) -> List[Tuple[str, str]]:
    """Load a merges table from the standard GPT-2 ``merges.txt`` format:
    optional ``#version`` header lines, then one ``left right`` pair per
    line in rank order. Real pipelines budget in a PUBLISHED tokenizer's
    tokens — this accepts any such file (no network involved) and feeds
    the same encoder as the embedded seed merges::

        merges = load_merges_file("/path/to/merges.txt")
        with_bpe_token_count(docs, merges=merges)

    Pre-tokenization contract: :func:`with_bpe_token_count` splits on
    whitespace and merges raw character sequences; for a BYTE-LEVEL
    merges file (GPT-2's own, Ġ-remapped alphabet) use
    :func:`with_gpt2_token_count`, which applies the published
    pre-splitter + byte→unicode remap so counts match the published
    tokenizer exactly."""
    merges: List[Tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"load_merges_file: expected 'left right' per line, "
                    f"got {line!r}"
                )
            merges.append((parts[0], parts[1]))
    return merges


def save_merges_file(merges, path: str) -> None:
    """Write a merges table in GPT-2 ``merges.txt`` format (rank order)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for l, r in merges:
            fh.write(f"{l} {r}\n")


def merges_from_dataframe(
    df: DataFrame, left_col: str = "l", right_col: str = "r",
    rank_col: str = "rank",
) -> List[Tuple[str, str]]:
    """Merges table from a DataFrame of (left, right, rank) — e.g. a
    vocabulary shipped as a parquet table next to the corpus. The collect
    is bounded by vocabulary size (tens of thousands of rows), driver-side
    by design: the ranks dict is broadcast into the Arrow UDF closure."""
    rows = df.select(left_col, right_col, rank_col).collect()
    rows.sort(key=lambda r: r[rank_col])
    return [(r[left_col], r[right_col]) for r in rows]


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Greedy BPE encode of one word: repeatedly merge the leftmost
    occurrence of the best-rank adjacent pair (see module docstring for
    the equivalence with the merge-all variant)."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        toks[best_i:best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def _ranks(merges=None) -> Dict[Tuple[str, str], int]:
    m = default_merges() if merges is None else merges
    return {pair: i for i, pair in enumerate(m)}


def bpe_count_column(text_col: Column, merges=None) -> Column:
    """Column: total BPE token count of a whitespace-tokenized text."""
    ranks = _ranks(merges)

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        memo: Dict[str, int] = {}

        def wc(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = len(encode_word(w, ranks))
                memo[w] = n
            return n

        return s.map(
            lambda t: sum(wc(w) for w in t.split(" ") if w) if t else 0
        ).astype("int64")

    return _count(text_col)


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", merges=None
) -> DataFrame:
    """Adds ``bpe_tokens``: the document's BPE token count. Zero-shuffle
    (a per-row Arrow map with a per-batch distinct-word memo)."""
    return df.withColumn("bpe_tokens", bpe_count_column(F.col(text_col), merges))


def chunk_documents_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_tokens: int = 64,
    merges=None,
) -> DataFrame:
    """Chunk documents on BPE token budgets: (id, chunk_id, chunk_text,
    n_tokens) where each chunk is a maximal run of consecutive WHOLE words
    whose BPE token sum fits ``max_tokens`` (a single word longer than the
    budget becomes its own over-budget chunk rather than being split
    mid-word). Greedy left-to-right packing — deterministic; zero-shuffle
    (per-row Arrow map + explode)."""
    ranks = _ranks(merges)

    @F.pandas_udf(
        "array<struct<chunk_id:long,chunk_text:string,n_tokens:long>>"
    )
    def _chunks(s: pd.Series) -> pd.Series:
        memo: Dict[str, int] = {}

        def wc(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = len(encode_word(w, ranks))
                memo[w] = n
            return n

        def pack(t):
            if not t:
                return []
            out = []
            cur: List[str] = []
            cur_n = 0
            for w in t.split(" "):
                n = wc(w)
                if cur and cur_n + n > max_tokens:
                    out.append({"chunk_id": len(out),
                                "chunk_text": " ".join(cur),
                                "n_tokens": cur_n})
                    cur, cur_n = [], 0
                cur.append(w)
                cur_n += n
            out.append({"chunk_id": len(out), "chunk_text": " ".join(cur),
                        "n_tokens": cur_n})
            return out

        return s.map(pack)

    return (
        df.select(F.col(id_col), F.explode(_chunks(F.col(text_col))).alias("_c"))
        .select(
            F.col(id_col),
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_tokens").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# GPT-2 byte-level mode (public encoder algorithm, reimplemented)
# ---------------------------------------------------------------------------

_GPT2_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


@lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """The public GPT-2 byte→unicode bijection: printable latin ranges map
    to themselves, every other byte to 256+n — so arbitrary bytes become
    a string the merges file's alphabet can address ('Ġ' = space)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _char_class(c: str) -> str:
    import unicodedata

    if c.isspace():
        return "s"
    cat = unicodedata.category(c)
    if cat.startswith("L"):
        return "L"
    if cat.startswith("N"):
        return "N"
    return "p"


def pretokenize_gpt2(text: str) -> List[str]:
    """GPT-2's pre-split, as a deterministic scanner (python ``re`` lacks
    \\p{L}; this replays the published pattern's leftmost-alternation
    semantics: contractions | ' ?letters' | ' ?numbers' | ' ?punct' |
    trailing-whitespace | whitespace)."""
    toks: List[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            hit = next((s for s in _GPT2_CONTRACTIONS
                        if text.startswith(s, i)), None)
            if hit:
                toks.append(hit)
                i += len(hit)
                continue
        start = i + 1 if (c == " " and i + 1 < n) else i
        if start < n:
            k = _char_class(text[start])
            if k in ("L", "N", "p"):
                # note: a punct run DOES swallow apostrophes ("?!'s" →
                # "?!'", "s") — the contraction alternatives only win at
                # the leftmost position, exactly like the published regex
                j = start
                while j < n and _char_class(text[j]) == k:
                    j += 1
                toks.append(text[i:j])
                i = j
                continue
        # whitespace run (rules 5/6: leave the last space for the next
        # token when a non-space follows a multi-space run)
        j = i
        while j < n and text[j].isspace():
            j += 1
        if j < n and j - i > 1:
            j -= 1
        toks.append(text[i:j if j > i else i + 1])
        i = j if j > i else i + 1
    return toks


def gpt2_pieces(text: str) -> List[str]:
    """Pre-split + byte→unicode remap: the exact symbol strings a GPT-2
    merges table addresses."""
    b2u = bytes_to_unicode()
    return ["".join(b2u[b] for b in piece.encode("utf-8"))
            for piece in pretokenize_gpt2(text)]


def gpt2_count_column(text_col: Column, merges) -> Column:
    """Column: total token count under a GPT-2-format merges table with
    byte-level pretokenization — budget documents in a PUBLISHED
    tokenizer's own tokens. Zero-shuffle Arrow map with a per-batch
    distinct-piece memo."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        memo: Dict[str, int] = {}

        def pc(p: str) -> int:
            v = memo.get(p)
            if v is None:
                v = len(encode_word(p, ranks))
                memo[p] = v
            return v

        return s.map(
            lambda t: sum(pc(p) for p in gpt2_pieces(t)) if t else 0
        ).astype("int64")

    return _count(text_col)


def with_gpt2_token_count(
    df: DataFrame, merges, text_col: str = "text",
    out_col: str = "gpt2_tokens",
) -> DataFrame:
    """Adds ``gpt2_tokens`` under a user-supplied GPT-2 merges table
    (:func:`load_merges_file`). Same encoder as the seed path; the
    pretokenizer + byte remap make counts match the published tokenizer
    for any merges file in that format."""
    return df.withColumn(out_col, gpt2_count_column(F.col(text_col), merges))
