"""RDF N-Triples export — the W3C interchange twin of the Neo4j sinks.

Serializes the property graph (GraphStore nodes + edges) as RDF 1.1
N-Triples lines, fully distributed: every line is built with native
Column string expressions (concat / regexp_replace chains), so the
export is one narrow projection per frame — no UDF, no driver collect,
and the line frame writes with ``df.write.text`` at any scale.

Mapping (mirrors ``GraphStore.triples()`` identity semantics,
core/store.py:584 — ``Label:pk`` when merged on a primary key, else
``Label:#uid``):

* node IRI        ``<{base}node/{pct(Label:pk)}>``
* edge line       ``<subj> <{base}rel/{pct(TYPE)}> <obj> .``
* property line   ``<subj> <{base}prop/{pct(name)}> "lex"[^^xsd] .``
  for every non-null, non-meta node property — string literals are
  untyped (RDF 1.1 implies xsd:string), booleans/integrals/floats/
  date/dateTime carry their XSD datatype IRI.

Escaping is spec-faithful and engine-portable (plain replace chains a
SQL oracle can mirror): literal bodies escape ``\\ " \\n \\r \\t``
(N-Triples ECHAR, RDF 1.1 §7); IRI segments percent-encode ``%`` first,
then the characters N-Triples forbids inside ``<…>``
(space ``< > " { } | ^ \\`` and backtick).

The reference has no RDF surface (its encoder targets Cypher,
neo4j/encoder.py); this is forward-looking interchange for the
KG-construction tier — triple stores and SPARQL engines ingest
N-Triples natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans import lowering as L

#: characters N-Triples forbids un-escaped inside an IRIREF, mapped to
#: their percent-encodings. ``%`` is FIRST (it must encode before any
#: ``%XX`` sequences are introduced); order of the rest is irrelevant
#: but fixed so the SQL mirror is byte-identical.
_IRI_PCT = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("\\", "%5C"),
]

_XSD = "http://www.w3.org/2001/XMLSchema#"


def pct_encode(col: Column) -> Column:
    """Percent-encode an IRI path segment (Column form; replace chain)."""
    for ch, enc in _IRI_PCT:
        col = F.replace(col, F.lit(ch), F.lit(enc))
    return col


def escape_literal(col: Column) -> Column:
    """N-Triples ECHAR escaping for a literal body: backslash first,
    then quote, LF, CR, TAB."""
    col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    col = F.replace(col, F.lit('"'), F.lit('\\"'))
    col = F.replace(col, F.lit("\n"), F.lit("\\n"))
    col = F.replace(col, F.lit("\r"), F.lit("\\r"))
    col = F.replace(col, F.lit("\t"), F.lit("\\t"))
    return col


def _xsd_datatype(dtype: T.DataType):
    """(lexical-form column fn, datatype IRI or None for plain string)."""
    if isinstance(dtype, T.BooleanType):
        return (
            lambda c: F.when(c, F.lit("true")).otherwise(F.lit("false")),
            _XSD + "boolean",
        )
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return lambda c: c.cast("string"), _XSD + "integer"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return lambda c: c.cast("string"), _XSD + "double"
    if isinstance(dtype, T.DateType):
        return lambda c: F.date_format(c, "yyyy-MM-dd"), _XSD + "date"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return (
            lambda c: F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
            _XSD + "dateTime",
        )
    return lambda c: c.cast("string"), None


def _node_iri(base: str, label_col: str, key_col: str, uid_col: str) -> Column:
    ident = F.concat_ws(
        ":",
        F.col(label_col),
        F.coalesce(
            F.col(key_col), F.concat(F.lit("#"), F.col(uid_col).cast("string"))
        ),
    )
    return F.concat(F.lit("<" + base + "node/"), pct_encode(ident), F.lit(">"))


def ntriples_lines(
    store,
    base_iri: str = "http://example.org/",
    include_properties: bool = True,
) -> DataFrame:
    """One-column DataFrame ``ntriple`` of N-Triples lines for the whole
    graph (edge triples + optional node-property literals).

    Scale shape: a narrow ``select`` over the edge frame plus one
    stack-explode pass over the node frame (same single-pass shape as
    ``GraphStore.triples(include_properties=True)``) — zero shuffles,
    zero joins; line order is not significant in N-Triples (the format
    is set-semantic), so no global sort is imposed.
    """
    parts = []
    if store._edges is not None:
        pred = F.concat(
            F.lit("<" + base_iri + "rel/"),
            pct_encode(F.col(L.RELTYPE)),
            F.lit(">"),
        )
        parts.append(
            store.edges.select(
                F.concat_ws(
                    " ",
                    _node_iri(base_iri, L.SRC_LABEL, L.SRC_KEY, L.SRC_UID),
                    pred,
                    _node_iri(base_iri, L.DST_LABEL, L.DST_KEY, L.DST_UID),
                    F.lit("."),
                ).alias("ntriple")
            )
        )
    if include_properties and store._nodes is not None:
        meta = set(L.NODE_META)
        nodes = store.nodes
        subj = _node_iri(base_iri, L.PLABEL, L.PKVAL, L.UID)
        stacked = []
        for field in nodes.schema.fields:
            if field.name in meta:
                continue
            lex_fn, dt_iri = _xsd_datatype(field.dataType)
            obj = F.concat(
                F.lit('"'),
                escape_literal(lex_fn(F.col(field.name))),
                F.lit('"' + (f"^^<{dt_iri}>" if dt_iri else "")),
            )
            pred = "<" + base_iri + "prop/" + _pct_encode_py(field.name) + ">"
            stacked.append(
                F.when(
                    F.col(field.name).isNotNull(),
                    F.concat_ws(" ", subj, F.lit(pred), obj, F.lit(".")),
                )
            )
        if stacked:
            parts.append(
                nodes.select(
                    F.explode(
                        F.filter(F.array(*stacked), lambda x: x.isNotNull())
                    ).alias("ntriple")
                )
            )
    if not parts:
        raise ValueError("store has neither edges nor nodes to export")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _pct_encode_py(s: str) -> str:
    """Driver-side twin of :func:`pct_encode` for static property names."""
    for ch, enc in _IRI_PCT:
        s = s.replace(ch, enc)
    return s


def write_ntriples(
    store,
    out_dir: str,
    base_iri: str = "http://example.org/",
    include_properties: bool = True,
) -> str:
    """Distributed text write of the N-Triples export (one ``.nt``-style
    part file per partition; concatenation of parts is a valid N-Triples
    document since the format is line-oriented and unordered)."""
    ntriples_lines(store, base_iri, include_properties).write.mode(
        "overwrite"
    ).text(out_dir)
    return out_dir
