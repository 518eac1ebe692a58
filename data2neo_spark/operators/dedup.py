"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (the point of this module):
* exact dedup is ONE hash-shuffle (groupBy md5) — map-side partial agg free;
* n-gram Jaccard joins on shingles, never doc×doc — the self-join explodes
  only where documents actually share shingles;
* MinHash+LSH banding turns all-pairs into per-bucket joins; candidate pairs
  are verified with exact Jaccard afterwards (classic two-phase);
* all of it is native Column expressions — no python in the hot path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_shingles


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Group identical texts by md5; returns (h, keeper_id, n_dups)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_id: Optional[int] = None,
) -> DataFrame:
    """All document pairs with n-gram Jaccard ≥ threshold.

    (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4dp.
    """
    if max_id is not None:
        df = df.where(F.col(id_col) < max_id)
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures over word shingles.

    Hash family: xxhash64(seed_i, shingle) — num_hashes aggregations in ONE
    groupBy pass (map-side combine keeps the shuffle at one row per doc)."""
    sh = word_shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket → candidate pairs
    (id_a, id_b, n_shared_bands)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidates from LSH, verified with exact Jaccard ≥ threshold."""
    cand = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands, shingle_n)
    sh = word_shingles(df, id_col, text_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # restrict BOTH shingle sides to candidate documents BEFORE the
    # self-join — otherwise a hot shingle shared by k docs materializes
    # ~k²/2 rows and the self-join re-creates the all-pairs explosion LSH
    # exists to avoid. (Catalyst cannot push a pair-level semi-join below
    # the join by itself.)
    cand_a = cand.select(F.col("id_a").alias(id_col)).distinct()
    cand_b = cand.select(F.col("id_b").alias(id_col)).distinct()
    a = sh.join(cand_a, id_col, "left_semi").select(
        F.col(id_col).alias("id_a"), "shingle"
    )
    b = sh.join(cand_b, id_col, "left_semi").select(
        F.col(id_col).alias("id_b"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .join(cand.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens: (id, simhash long).

    Per-bit weighted sums as 64 native aggregations in one groupBy (no UDF).
    """
    def mask(i: int) -> int:
        # signed-64 masks: bit 63 is the sign bit in a JVM long
        return (1 << i) if i < 63 else -(1 << 63)

    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).withColumn("h", F.xxhash64(F.col("word")))
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(mask(i))) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_bit = tok.groupBy(id_col).agg(*aggs)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(mask(i))).otherwise(F.lit(0))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return per_bit.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: 4 × 16-bit chunks — two near-dup hashes (≤3 differing bits)
    must agree on at least one chunk, so candidates join per chunk bucket
    instead of all-pairs."""
    sh = simhash(df, id_col, text_col)
    chunks = sh.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                      "chunk_idx", "chunk")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                      "chunk_idx", "chunk")
    pairs = (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_duplicates_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane buckets, exact
    cosine only within buckets. All-pairs never materializes — at 10^9
    vectors the bucket join is the only shuffle. Recall < 1 by construction
    (tunable via n_planes; near-identical vectors almost always share a
    bucket since they disagree on a plane with prob ≈ angle/π)."""
    from .similarity import cosine_expr, lsh_signature, with_norm

    sig = with_norm(lsh_signature(df, vec_col, dim, n_planes, seed), vec_col)
    a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                   F.col("_norm").alias("na"), "bucket")
    b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                   F.col("_norm").alias("nb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    cos = cosine_expr("va", "vb", "na", "nb")
    return (
        pairs.withColumn("cos", F.round(cos, 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .distinct()
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_id: Optional[int] = None,
) -> DataFrame:
    """Cosine near-dup pairs (id_a, id_b, cos rounded 4dp) ≥ threshold."""
    from .similarity import cosine_expr, with_norm

    if max_id is not None:
        df = df.where(F.col(id_col) < max_id)
    n = with_norm(df, vec_col)
    a = n.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                 F.col("_norm").alias("na"))
    b = n.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                 F.col("_norm").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_expr("va", "vb", "na", "nb")
    return (
        pairs.withColumn("cos", F.round(cos, 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
