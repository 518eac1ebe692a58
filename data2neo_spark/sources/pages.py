"""Synthetic Common-Crawl-style web-page corpus (BASELINE.json input_hint).

Deterministic from (seed, row_id), generated entirely with native Column
expressions — scale-parameterized, no driver-side data. Embeds a controlled
set of entity mentions drawn from a Zipf-skewed dictionary so hub entities
and hot predicates exist for skew/salting tests (FIXTURES.md §1).

Schema: pages(url string, warc_ts timestamp, html binary, text string,
lang string); companion entity_dict(entity_id long, surface string,
canonical string, kind string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 5000
WORDS_PER_PAGE = 60
MENTIONS_PER_PAGE = 6
LANGS = ["en", "de", "fr", "es"]
KINDS = ["person", "org", "place", "work"]


def _u01(*cols) -> "F.Column":
    """Deterministic uniform [0,1) from hashed inputs."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) / F.lit(1_000_000.0))


def entity_dictionary(spark: SparkSession, n_entities: int = 1000, seed: int = 42) -> DataFrame:
    """(entity_id, surface, canonical, kind) — surfaces are single tokens so
    mention detection is a token-level dictionary join."""
    e = spark.range(n_entities).select(F.col("id").alias("entity_id"))
    return e.select(
        "entity_id",
        F.concat(F.lit("ent"), F.col("entity_id").cast("string")).alias("surface"),
        F.concat(F.lit("ENT_"), F.col("entity_id").cast("string")).alias("canonical"),
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]),
            (F.pmod(F.xxhash64(F.lit(seed), F.col("entity_id")), F.lit(len(KINDS))) + 1).cast("int"),
        ).alias("kind"),
    )


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    n_entities: int = 1000,
    seed: int = 42,
    zipf_exponent: float = 3.0,
    partitions: int = 0,
) -> DataFrame:
    """Generate the pages table. Mentions are Zipf-skewed: entity index =
    floor(u^zipf_exponent * n_entities), so entity 0 is a hub."""
    base = spark.range(n_pages)
    if partitions:
        base = base.repartition(partitions)
    pid = F.col("id")

    def word(i: int):
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit(seed), pid, F.lit(i)), F.lit(VOCAB_SIZE)).cast("string"),
        )

    def mention(i: int):
        u = _u01(F.lit(seed + 7), pid, F.lit(i))
        idx = F.floor(F.pow(u, F.lit(zipf_exponent)) * F.lit(n_entities)).cast("long")
        return F.concat(F.lit("ent"), idx.cast("string"))

    # interleave: every 10th slot is an entity mention
    tokens = []
    m = 0
    for i in range(WORDS_PER_PAGE):
        if i % (WORDS_PER_PAGE // MENTIONS_PER_PAGE) == 3 and m < MENTIONS_PER_PAGE:
            tokens.append(mention(m))
            m += 1
        else:
            tokens.append(word(i))
    text = F.concat_ws(" ", *tokens)

    title = F.concat(F.lit("Page "), pid.cast("string"))
    html_str = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title></head><body><p>"), text,
        F.lit("</p></body></html>"),
    )
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]),
        (F.pmod(F.xxhash64(F.lit(seed + 13), pid), F.lit(len(LANGS))) + 1).cast("int"),
    )
    return base.select(
        F.concat(F.lit("https://example.org/page/"), pid.cast("string")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=pid.cast("double"))).alias("warc_ts"),
        F.encode(html_str, "utf-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
