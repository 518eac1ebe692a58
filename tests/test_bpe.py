"""BPE tokenizer: deterministic training, encoding equivalence with the
public merge-all-occurrences algorithm, Spark operators, chunk packing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data2neo_spark.operators import bpe


def _encode_merge_all(word, merges):
    """Independent reference: GPT-2-style loop — find the best-rank pair,
    merge ALL its non-overlapping occurrences left-to-right, repeat."""
    ranks = {p: i for i, p in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        pairs = {(a, b) for a, b in zip(toks, toks[1:])}
        cand = [p for p in pairs if p in ranks]
        if not cand:
            break
        best = min(cand, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and (toks[i], toks[i + 1]) == best:
                out.append(toks[i] + toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_training_deterministic_and_useful():
    m1 = bpe.train_merges(bpe.SEED_CORPUS, bpe.N_MERGES)
    m2 = bpe.train_merges(bpe.SEED_CORPUS, bpe.N_MERGES)
    assert m1 == m2 and len(m1) > 50
    ranks = {p: i for i, p in enumerate(m1)}
    # a frequent seed word compresses to one token
    assert bpe.encode_word("the", ranks) == ["the"]


def test_leftmost_single_merge_equals_merge_all():
    """The one-occurrence-per-step encoder (SQL-replayable) must equal the
    public merge-all-per-iteration algorithm on every corpus word and on
    adversarial repeats."""
    merges = bpe.default_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    words = set(bpe.SEED_CORPUS.split()) | {
        "aaaa", "thethe", "ananan", "windowwindow", "xyzzy", "a", ""
    }
    for w in words:
        assert bpe.encode_word(w, ranks) == _encode_merge_all(w, merges), w


def test_unknown_chars_are_singleton_tokens():
    ranks = {p: i for i, p in enumerate(bpe.default_merges())}
    toks = bpe.encode_word("q7#", ranks)
    assert toks == ["q", "7", "#"]


def test_with_bpe_token_count(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the the the", "", "stream window"],
    }))
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe.with_bpe_token_count(df).collect()}
    ranks = {p: i for i, p in enumerate(bpe.default_merges())}
    exp2 = len(bpe.encode_word("stream", ranks)) + len(bpe.encode_word("window", ranks))
    assert got == {0: 3, 1: 0, 2: exp2}


def test_with_token_count_bpe_wiring(spark):
    from data2neo_spark.operators.text import with_token_count

    df = spark.createDataFrame(pd.DataFrame({"text": ["the fast scan"]}))
    row = with_token_count(df, tokenizer="bpe").collect()[0]
    assert row["ws_tokens"] == 3 and row["bpe_tokens"] >= 3
    with pytest.raises(ValueError):
        with_token_count(df, tokenizer="nope")


def test_chunk_documents_bpe_packing(spark):
    ranks = {p: i for i, p in enumerate(bpe.default_merges())}
    text = " ".join(["the", "window", "stream", "filter"] * 10)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    rows = sorted(
        bpe.chunk_documents_bpe(df, "doc_id", max_tokens=10).collect(),
        key=lambda r: r["chunk_id"],
    )
    # chunks rebuild the text exactly, budgets respected, counts exact
    assert " ".join(r["chunk_text"] for r in rows) == text
    for r in rows:
        assert r["n_tokens"] <= 10
        assert r["n_tokens"] == sum(
            len(bpe.encode_word(w, ranks)) for w in r["chunk_text"].split(" ")
        )
    # greedy maximality: adding the next chunk's first word would overflow
    for a, b in zip(rows, rows[1:]):
        nxt = len(bpe.encode_word(b["chunk_text"].split(" ")[0], ranks))
        assert a["n_tokens"] + nxt > 10


def test_external_merges_file_roundtrip(tmp_path):
    """GPT-2-format merges.txt roundtrip: saved ranks reload identically
    and the encoder produces the same tokenization from the file as from
    the in-memory table."""
    path = str(tmp_path / "merges.txt")
    bpe.save_merges_file(bpe.default_merges(), path)
    with open(path) as fh:
        assert fh.readline().startswith("#version")
    loaded = bpe.load_merges_file(path)
    assert loaded == list(bpe.default_merges())
    ranks = {p: i for i, p in enumerate(loaded)}
    for w in ["the", "window", "stream", "zzqx"]:
        assert bpe.encode_word(w, ranks) == bpe.encode_word(
            w, {p: i for i, p in enumerate(bpe.default_merges())}
        )


def test_external_merges_change_tokenization(spark, tmp_path):
    """A user-supplied merges file (not the embedded seed) drives the
    Spark counting path: a vocabulary that merges 'a'+'b' tokenizes
    'ababab' differently from the default."""
    path = str(tmp_path / "custom.txt")
    bpe.save_merges_file([("a", "b"), ("ab", "ab")], path)
    merges = tuple(bpe.load_merges_file(path))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["ababab xyz"]})
    )
    got = bpe.with_bpe_token_count(df, merges=merges).collect()[0]
    # ababab -> ab ab ab -> abab ab = 2 tokens; xyz stays 3 singles
    assert got["bpe_tokens"] == 2 + 3
    default = bpe.with_bpe_token_count(df).collect()[0]
    assert default["bpe_tokens"] != got["bpe_tokens"]


def test_merges_from_dataframe(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"l": ["t", "th"], "r": ["h", "e"], "rank": [0, 1]})
    )
    merges = bpe.merges_from_dataframe(df)
    assert merges == [("t", "h"), ("th", "e")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("the", ranks) == ["the"]


def test_gpt2_pretokenizer_semantics():
    """The scanner replays the published pattern's leftmost-alternation
    semantics: contractions at the leftmost position only, optional
    single leading space on letter/number/punct runs, multi-space runs
    leave the last space for the following token."""
    cases = {
        "Hello world": ["Hello", " world"],
        "don't stop": ["don", "'t", " stop"],
        "I'll we've he's": ["I", "'ll", " we", "'ve", " he", "'s"],
        "x3 + 4!": ["x", "3", " +", " 4", "!"],
        "a  b": ["a", " ", " b"],
        "a   b": ["a", "  ", " b"],
        "tail  ": ["tail", "  "],
        "a\nb": ["a", "\n", "b"],
        "?!'s": ["?!'", "s"],        # punct run swallows the apostrophe
        "": [],
        "  ": ["  "],
    }
    for text, want in cases.items():
        assert bpe.pretokenize_gpt2(text) == want, text
    # lossless: pieces concatenate back to the input
    for text in cases:
        assert "".join(bpe.pretokenize_gpt2(text)) == text


def test_gpt2_byte_remap_and_count(spark):
    """bytes_to_unicode is the public bijection; a byte-level merges
    table drives exact counts through the Spark column."""
    b2u = bpe.bytes_to_unicode()
    assert b2u[ord(" ")] == "Ġ" and b2u[ord("\n")] == "Ċ"
    assert bpe.gpt2_pieces("a b") == ["a", "Ġb"]
    # utf-8 multibyte survives the remap losslessly
    piece = bpe.gpt2_pieces("é")[0]
    assert len(piece) == 2    # two remapped bytes
    inv = {v: k for k, v in b2u.items()}
    assert bytes(inv[c] for c in piece).decode("utf-8") == "é"

    merges = [("Ġ", "w"), ("w", "w")]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["w w w", None]})
    )
    got = {r["doc_id"]: r["gpt2_tokens"]
           for r in bpe.with_gpt2_token_count(df, merges).collect()}
    # "w w w" → pieces w, Ġw, Ġw → 1 + 1 + 1 = 3 tokens
    assert got[0] == 3 and got[1] == 0


def test_train_merges_from_corpus_matches_string_trainer(spark):
    """Distributed training == the pure-python string trainer on the same
    corpus (vocab under the cap, so no truncation)."""
    from data2neo_spark.operators import bpe

    texts = [
        "the engine scans the table and the table sorts",
        "the stream joins the table while the engine waits",
        "scans and sorts flow through the stream engine",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = bpe.train_merges_from_corpus(df, n_merges=30)
    want = bpe.train_merges(" ".join(texts), 30)
    assert got == want
    assert len(got) > 5  # actually learned something

    # trained merges drive the encoder: 'the' collapses to one token
    ranks = {p: i for i, p in enumerate(got)}
    assert bpe.encode_word("the", ranks) == ["the"]


def test_train_merges_from_corpus_max_vocab_cap(spark):
    """The cap keeps the most frequent words (ties -> lexicographic) and
    training still runs on the truncated table."""
    from data2neo_spark.operators import bpe

    df = spark.createDataFrame(
        [(0, "aa aa aa bb bb zz")], "doc_id: long, text: string"
    )
    # cap to 2 words: aa (3) and bb (2) survive, zz is dropped
    got = bpe.train_merges_from_corpus(df, n_merges=5, max_vocab=2)
    want = bpe.train_merges("aa aa aa bb bb", 5)
    assert got == want
