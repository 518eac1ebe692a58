"""Model-based document quality scoring: a trained LINEAR classifier head
over cheap text features — the fastText/DCLM-style "quality classifier"
stage real training-data pipelines run after rule filters.

Everything is exactly reproducible end-to-end:

* the training set is an embedded fixture (short good-prose vs
  spam/gibberish/boilerplate examples written for this module);
* training is deterministic pure-python logistic regression (fixed
  init/learning-rate/iterations, float64 batch gradient descent — a pure
  function of the fixture);
* the learned weights are QUANTIZED to integer micro-units and the score
  is an INTEGER dot product over integer features
  (``logit_micro = b + Σ wᵢ·fᵢ``) — no float in the scoring path, so
  Spark and the DuckDB oracle produce bit-identical scores (float
  exp/ln are not hash-comparable across engines; integer +,× are).

Spark execution is a zero-shuffle Column projection (no UDF at all);
features are plain string/array expressions with identical DuckDB
equivalents. The reference repo has no classifier — first-class
training-pipeline extension (SURVEY.md §2 additions).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scoring stopwords (shared with the SQL oracle; counted as ' w '
# occurrences over the space-padded text, like text._occurrences)
STOPWORDS: List[str] = ["the", "and", "of", "to", "in", "is"]

WEIGHT_SCALE = 1_000_000

# (label, text): 1 = keep-quality prose, 0 = drop (spam / gibberish /
# keyword stuffing / boilerplate). Written for this module.
TRAIN_FIXTURE: List[Tuple[int, str]] = [
    (1, "the engine reads the table and sorts the rows by key before the merge join starts"),
    (1, "the children are playing in the garden while the mother reads a good book about history"),
    (1, "a stream of batches flows through the filter and the window counts the values in each group"),
    (1, "the planner picks a broadcast join when the small table fits in memory and the cost is low"),
    (1, "the supplier ships the part to the customer and the order line records the quantity and price"),
    (1, "the quality filter keeps the clean lines of text and drops the noisy ones from the corpus"),
    (1, "the graph stores the nodes and the edges and the labels mark the kinds of entities involved"),
    (1, "the language model trains on the documents that remain after the duplicates are removed"),
    (1, "in the morning the team reviews the results of the run and plans the next set of changes"),
    (1, "the window function computes a running sum of the values in the order of the event times"),
    (0, "buy now buy now buy now best price best price click here click here win win win"),
    (0, "xjqz vkpw qqrt zzxv mmnp wwky bbtt ggfd hhjs llqa zzzz xxxx qqqq wwww"),
    (0, "aaaaaaaa bbbbbbbb cccccccc dddddddd eeeeeeee ffffffff gggggggg hhhhhhhh"),
    (0, "1234 5678 9999 0000 1111 2222 3333 4444 5555 6666 7777 8888 1010 2020"),
    (0, "cheap cheap cheap sale sale sale free free free offer offer offer deal deal deal"),
    (0, "lorem lorem lorem lorem ipsum ipsum ipsum ipsum dolor dolor dolor dolor sit sit"),
    (0, "click subscribe like share click subscribe like share click subscribe like share"),
    (0, "q w e r t y u i o p a s d f g h j k l z x c v b n m"),
    (0, "000 111 a1 b2 c3 d4 e5 f6 77 88 99 x9 y8 z7 000 111 222 333"),
    (0, "casino poker slots casino poker slots casino poker slots jackpot jackpot jackpot"),
]

FEATURE_NAMES = [
    "n_words", "avg_word_len_x10", "n_digit_words", "n_stopword_hits",
    "n_repeat_words", "max_word_len",
]


def features_py(text: str) -> List[int]:
    """Integer feature vector (python mirror of the Column/SQL exprs)."""
    words = text.split(" ")
    n_words = len(words)
    n_chars = len(text)
    non_space = n_chars - (n_words - 1)
    avg_x10 = (non_space * 10) // n_words if n_words else 0
    n_digit_words = sum(1 for w in words if any(c.isdigit() for c in w))
    padded = " " + text + " "
    n_stop = sum(padded.count(f" {w} ") for w in STOPWORDS)
    n_repeat = n_words - len(set(words))
    max_len = max((len(w) for w in words), default=0)
    return [n_words, avg_x10, n_digit_words, n_stop, n_repeat, max_len]


@lru_cache(maxsize=1)
def trained_weights() -> Tuple[int, Tuple[int, ...]]:
    """(bias_micro, weights_micro): deterministic logistic regression on
    the fixture (z-scored features, fixed 500 GD steps at lr 0.5),
    quantized to integer micro-units over the RAW feature scale."""
    import math

    xs = [features_py(t) for _lbl, t in TRAIN_FIXTURE]
    ys = [lbl for lbl, _t in TRAIN_FIXTURE]
    k = len(FEATURE_NAMES)
    n = len(xs)
    mean = [sum(x[j] for x in xs) / n for j in range(k)]
    var = [sum((x[j] - mean[j]) ** 2 for x in xs) / n for j in range(k)]
    std = [math.sqrt(v) if v > 0 else 1.0 for v in var]
    zs = [[(x[j] - mean[j]) / std[j] for j in range(k)] for x in xs]
    w = [0.0] * k
    b = 0.0
    for _ in range(500):
        gw = [0.0] * k
        gb = 0.0
        for z, y in zip(zs, ys):
            p = 1.0 / (1.0 + math.exp(-(b + sum(wj * zj for wj, zj in zip(w, z)))))
            err = p - y
            for j in range(k):
                gw[j] += err * z[j]
            gb += err
        for j in range(k):
            w[j] -= 0.5 * gw[j] / n
        b -= 0.5 * gb / n
    # fold the z-scoring into raw-scale weights: w·(x−μ)/σ + b
    raw_w = [w[j] / std[j] for j in range(k)]
    raw_b = b - sum(w[j] * mean[j] / std[j] for j in range(k))
    return (
        int(round(raw_b * WEIGHT_SCALE)),
        tuple(int(round(rw * WEIGHT_SCALE)) for rw in raw_w),
    )


def score_py(text: str) -> int:
    bias, ws = trained_weights()
    return bias + sum(wi * fi for wi, fi in zip(ws, features_py(text)))


def _feature_cols(text: Column) -> List[Column]:
    words = F.split(text, " ")
    n_words = F.size(words)
    n_chars = F.length(text)
    non_space = n_chars - (n_words - F.lit(1))
    # integer floor-div via (a - a%b)/b keeps everything in exact longs
    avg_x10 = ((non_space * 10 - F.pmod(non_space * 10, n_words)) / n_words).cast("long")
    n_digit_words = F.size(F.filter(words, lambda w: w.rlike("[0-9]")))
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    def occ(word: str) -> Column:
        pat = f" {word} "
        return (
            (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
            / len(pat)
        ).cast("long")
    n_stop = sum([occ(w) for w in STOPWORDS], F.lit(0).cast("long"))
    n_repeat = n_words - F.size(F.array_distinct(words))
    max_len = F.array_max(F.transform(words, lambda w: F.length(w)))
    return [
        n_words.cast("long"), avg_x10, n_digit_words.cast("long"),
        n_stop, n_repeat.cast("long"), max_len.cast("long"),
    ]


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``quality_logit_micro`` (integer linear score, positive =
    keep) and ``quality_keep`` — a zero-shuffle Column projection with
    the trained weights inlined as literals."""
    bias, ws = trained_weights()
    feats = _feature_cols(F.col(text_col))
    logit = F.lit(bias).cast("long")
    for wi, fi in zip(ws, feats):
        logit = logit + F.lit(int(wi)).cast("long") * fi
    return df.withColumn("quality_logit_micro", logit).withColumn(
        "quality_keep", F.col("quality_logit_micro") > 0
    )
