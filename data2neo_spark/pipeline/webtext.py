"""Web-text KG-construction pipeline (the BASELINE.json north rule).

Stages (all DataFrame-native):
  pages (url, warc_ts, html, text, lang)
    → extract     html → text (deterministic, byte-identical per url)
    → mention     tokenize + dictionary join (broadcast entity_dict;
                  salting knob for hub surfaces)
    → link        score + canonicalize mentions to entity ids
    → materialize nodes / edges / (subj, pred, obj) triples via the same
                  merge machinery as the schema engine

The small ``mention_triples`` slice runs the same shape over the driver's
``documents`` table with a static term dictionary so the DuckDB oracle can
verify it value-for-value.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# static term dictionary for the oracle-checked slice (kept in sync with
# __spark_entry__.oracle_sql's kg_webtext_mentions)
TERM_DICT: List[str] = [
    "spark", "join", "window", "batch", "stream", "table", "query", "shuffle",
]


def mention_triples(documents: DataFrame, terms: Optional[List[str]] = None) -> DataFrame:
    """Dictionary-based mention detection + linking over a text corpus.

    (Doc:<id>, MENTIONS, Term:<word>) triples, distinct per (doc, term).
    The word explode happens AFTER an `exists` prefilter on the tokenized
    array, so documents with no dictionary hits never reach the shuffle.
    """
    terms = terms if terms is not None else TERM_DICT
    words = F.split(F.col("text"), " ")
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = documents.select(
        F.col("doc_id"),
        F.array_distinct(
            F.filter(words, lambda w: F.array_contains(term_arr, w))
        ).alias("mentions"),
    ).where(F.size("mentions") > 0)
    return hits.select(
        F.concat(F.lit("Doc:"), F.col("doc_id").cast("string")).alias("subj"),
        F.lit("MENTIONS").alias("pred"),
        F.explode("mentions").alias("term"),
    ).select(
        "subj", "pred", F.concat(F.lit("Term:"), F.col("term")).alias("obj")
    )


# ---------------------------------------------------------------------------
# full north-rule pipeline over the pages corpus
# ---------------------------------------------------------------------------

def extract_text(html_col: Column) -> Column:
    """Deterministic html→text extraction: drop the <head> block, strip tags,
    trim. This IS the reference extractor for the per-url byte-identity
    invariant (the reference repo has no extractor of its own — SURVEY.md M6
    defines it here and pins it with golden tests)."""
    s = F.decode(html_col, "utf-8")
    s = F.regexp_replace(s, "<head>.*?</head>", "")
    s = F.regexp_replace(s, "<[^>]*>", "")
    return F.trim(s)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages → (url, warc_ts, lang, text) with text re-derived from html."""
    return pages.select(
        "url", "warc_ts", "lang", extract_text(F.col("html")).alias("text")
    )


# dictionaries up to this size use the zero-shuffle in-row strategy
ARRAY_STRATEGY_MAX_DICT = 50_000
# rough bytes/row of a (surface, entity_id, canonical, kind) dict row, used
# to translate the row cap into a byte cap for the stats-based decision
_DICT_ROW_BYTES_EST = 128


def detect_mentions(
    docs: DataFrame,
    entity_dict: DataFrame,
    text_col: str = "text",
    salt_buckets: int = 0,
    strategy: str = "auto",
    count_hits: bool = True,
) -> DataFrame:
    """Tokenize + dictionary lookup → (url, surface, entity_id, canonical,
    kind, n_hits).

    Two physical strategies:

    * ``array`` — ZERO-shuffle: the surface set is folded into the row as a
      literal array; per-document mention counting happens inside the scan
      stage with higher-order functions (array_intersect + filter), then a
      broadcast join attaches entity metadata. Per-(url,...) aggregation is
      per-row by construction, so no groupBy shuffle exists at all. Used
      automatically when the dictionary is small enough to inline.
    * ``join`` — the scale path for dictionaries too big to inline: explode
      tokens, broadcast-join the dict, groupBy with map-side partial agg
      (one shuffle of ~1 row per mention). ``salt_buckets`` salts this
      aggregation for hot (url,surface) keys — the A7 two-phase pattern.
    """
    if strategy == "auto":
        if salt_buckets:
            strategy = "join"
        else:
            # metadata decision, not an eager count() job: the optimizer's
            # byte estimate is free for file-backed dicts (same pattern as
            # the converter's broadcast decision, core/converter.py
            # _estimated_bytes); count() only as a stats-less fallback
            from ..core.converter import Converter

            est = Converter._estimated_bytes(entity_dict)
            if est is not None:
                small = est <= ARRAY_STRATEGY_MAX_DICT * _DICT_ROW_BYTES_EST
            else:
                small = entity_dict.count() <= ARRAY_STRATEGY_MAX_DICT
            strategy = "array" if small else "join"

    if strategy == "array":
        surfaces = [r[0] for r in entity_dict.select("surface").collect()]
        surf_arr = F.array(*[F.lit(s) for s in sorted(surfaces)])
        words = F.split(F.col(text_col), " ")
        # The per-doc mention set is computed inside the scan stage with
        # higher-order functions — zero shuffle. CAREFUL with expression
        # duplication: whole-stage codegen does not CSE across a Filter +
        # Project of the same array expression (lambda exprs disable
        # subexpression elimination), so the mention array feeds ONE
        # generator directly — explode of an empty array emits no rows,
        # which also makes a size()>0 prefilter redundant.
        if count_hits:
            # counts need the word array after the explode: count word
            # occurrences equal to each mention — still one projection chain
            exploded = docs.select(
                F.col("url"),
                F.explode(
                    F.transform(
                        F.array_intersect(F.array_distinct(words), surf_arr),
                        lambda m: F.struct(
                            m.alias("surface"),
                            F.size(F.filter(words, lambda w: w == m))
                            .cast("long").alias("n_hits"),
                        ),
                    )
                ).alias("_m"),
            ).select("url", F.col("_m.surface").alias("surface"),
                     F.col("_m.n_hits").alias("n_hits"))
        else:
            exploded = docs.select(
                F.col("url"),
                F.explode(
                    F.array_intersect(F.array_distinct(words), surf_arr)
                ).alias("surface"),
            ).withColumn("n_hits", F.lit(1).cast("long"))
        return exploded.join(F.broadcast(entity_dict), "surface").select(
            "url", "surface", "entity_id", "canonical", "kind", "n_hits"
        )

    tok = docs.select(
        F.col("url"),
        F.explode(F.split(F.col(text_col), " ")).alias("surface"),
    )
    hits = tok.join(F.broadcast(entity_dict), "surface")
    if salt_buckets:
        partial = (
            hits.withColumn("_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets)))
            .groupBy("url", "surface", "entity_id", "canonical", "kind", "_salt")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        return (
            partial.groupBy("url", "surface", "entity_id", "canonical", "kind")
            .agg(F.sum("n_hits").alias("n_hits"))
        )
    return hits.groupBy("url", "surface", "entity_id", "canonical", "kind").agg(
        F.count(F.lit(1)).alias("n_hits")
    )


def link_entities(mentions: DataFrame, assume_unambiguous: bool = False) -> DataFrame:
    """Score + canonicalize: deterministic link score (hit count weighted by
    surface length); best canonical per (url, surface) kept. With a 1:1
    dictionary this is a pass-through ranking; with ambiguous surfaces the
    window picks the max-score candidate deterministically."""
    scored = mentions.withColumn(
        "score", F.col("n_hits") * F.length(F.col("surface"))
    )
    if assume_unambiguous:
        # 1:1 surface→entity dictionary: the pick-best aggregation is an
        # identity — skip its shuffle entirely
        return scored
    # max_by aggregation instead of a row_number window: no per-partition
    # sort (a hash agg, not a sort-based window)
    order = F.struct(F.col("score"), -F.col("entity_id"))
    picked = scored.groupBy("url", "surface").agg(
        F.max_by(
            F.struct("entity_id", "canonical", "kind", "n_hits", "score"), order
        ).alias("_best")
    )
    return picked.select(
        "url", "surface",
        F.col("_best.entity_id").alias("entity_id"),
        F.col("_best.canonical").alias("canonical"),
        F.col("_best.kind").alias("kind"),
        F.col("_best.n_hits").alias("n_hits"),
        F.col("_best.score").alias("score"),
    )


def link_entities_contextual(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prior_weight: int = 10,
    overlap_weight: int = 3,
) -> DataFrame:
    """Entity DISAMBIGUATION — the north rule's "entity-link scoring" with
    an AMBIGUOUS dictionary (several candidate entities per surface), the
    step plain link_entities can't do: the winner depends on the document,
    not just the surface.

    ``candidates`` columns: (surface, entity_id, canonical, prior, desc) —
    ``prior`` an integer popularity prior, ``desc`` a space-separated bag
    of context terms. Score per (doc, surface, candidate):

        score = prior·prior_weight
              + |context ∩ desc_terms|·overlap_weight

    where context = the document's distinct tokens restricted to the
    candidate description vocabulary (so the carried context array is
    bounded by the dictionary, not the document). Winner per (doc, surface)
    = max score, ties to the smallest entity_id. Integer-exact, so the
    DuckDB oracle hash-verifies every score.

    Shape: the dictionary (surfaces + desc vocabulary) folds into the scan
    as literal arrays — mention detection AND context extraction are
    zero-shuffle higher-order expressions; candidates broadcast-join on
    surface; one (doc, surface) max_by hash aggregation picks winners (no
    sort-based window). At 100 TB the only corpus-wide movement is that
    single partial-agg shuffle of ~1 row per mention; dictionaries beyond
    broadcast size take detect_mentions' join strategy instead.
    """
    rows = candidates.select("surface", "desc").collect()
    surfaces = sorted({r["surface"] for r in rows})
    vocab = sorted({t for r in rows for t in r["desc"].split(" ") if t})
    surf_arr = F.array(*[F.lit(s) for s in surfaces])
    vocab_arr = F.array(*[F.lit(t) for t in vocab])

    # bind the word array once; ONE consumer per expensive higher-order
    # expression (whole-stage codegen does not CSE lambda expressions)
    bound = docs.select(
        F.col(id_col), F.array_distinct(F.split(F.col(text_col), " ")).alias("_dw")
    )
    mentions = bound.select(
        F.col(id_col),
        F.array_intersect(F.col("_dw"), vocab_arr).alias("_ctx"),
        F.explode(F.array_intersect(F.col("_dw"), surf_arr)).alias("surface"),
    )
    cand = candidates.withColumn("_desc_arr", F.split(F.col("desc"), " "))
    scored = mentions.join(
        F.broadcast(cand.select("surface", "entity_id", "canonical", "prior", "_desc_arr")),
        "surface",
    ).withColumn(
        "score",
        (
            F.col("prior") * F.lit(int(prior_weight))
            + F.size(F.array_intersect(F.col("_ctx"), F.col("_desc_arr")))
            * F.lit(int(overlap_weight))
        ).cast("long"),
    )
    order = F.struct(F.col("score"), -F.col("entity_id"))
    picked = scored.groupBy(id_col, "surface").agg(
        F.max_by(F.struct("entity_id", "canonical", "score"), order).alias("_best")
    )
    return picked.select(
        id_col,
        "surface",
        F.col("_best.entity_id").alias("entity_id"),
        F.col("_best.canonical").alias("canonical"),
        F.col("_best.score").alias("score"),
    )


def pages_to_triples(
    pages: DataFrame,
    entity_dict: DataFrame,
    salt_buckets: int = 0,
) -> DataFrame:
    """Full pipeline: extract → detect → link → (subj, pred, obj) triples."""
    docs = extract_pages(pages)
    # one tiny driver-side job: an unambiguous dictionary lets the link
    # stage skip its pick-best shuffle
    unambiguous = (
        entity_dict.groupBy("surface").count().where(F.col("count") > 1).isEmpty()
    )
    linked = link_entities(
        detect_mentions(docs, entity_dict, salt_buckets=salt_buckets),
        assume_unambiguous=unambiguous,
    )
    return linked.select(
        F.concat(F.lit("Page:"), F.col("url")).alias("subj"),
        F.lit("MENTIONS").alias("pred"),
        F.concat(F.lit("Entity:"), F.col("canonical")).alias("obj"),
    )


def pages_to_graph(
    pages: DataFrame,
    entity_dict: DataFrame,
    store,
    salt_buckets: int = 0,
):
    """Materialize the full node/edge graph through the schema engine: Page
    nodes, Entity nodes (merged on canonical — the IDStore-as-keyed-DataFrame
    path), MENTIONS edges with n_hits/score props."""
    from ..core.converter import Converter

    docs = extract_pages(pages)
    # the Converter auto-persists shuffle-derived sources feeding rel rules
    # (freezes row ids across passes and saves the recompute), so no manual
    # persist is needed here
    linked = link_entities(
        detect_mentions(docs, entity_dict, salt_buckets=salt_buckets)
    )
    schema = """
ENTITY("pages"):
    NODE("Page") page:
        + url = pages.url
        - lang = pages.lang

ENTITY("mentions"):
    NODE("Entity") ent:
        + canonical = mentions.canonical
        - kind = mentions.kind
    RELATIONSHIP(MATCH("Page", url = mentions.url), "MENTIONS", ent):
        + surface = mentions.surface
        - n_hits = INT(mentions.n_hits)
        - score = INT(mentions.score)
"""
    # NOTE: the '+ surface' primary key makes the edge identity content-based
    # (src, type, dst, surface) — required because `mentions` is a derived
    # (shuffled) DataFrame whose row order is not execution-stable, so
    # CREATE-mode surrogate ids would not be idempotent across resumes.
    conv = Converter(schema, [("pages", docs), ("mentions", linked)], store=store)
    return conv(pages.sparkSession)
