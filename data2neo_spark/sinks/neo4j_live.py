"""Live Neo4j commit sink — optional bridge to a running database.

The reference's output layer writes straight to Neo4j through the python
driver (reference neo4j/__init__.py:7-48, core/converter.py:101-133, with
per-batch MERGE/CREATE statements from neo4j/cypher.py:98-175). This module
closes that parity gap for users with an actual Neo4j instance:

* :func:`node_batches` / :func:`edge_batches` — PURE generators turning the
  canonical node/edge tables into ``(cypher, rows)`` bulk-UNWIND batches.
  Fully testable without a database; rows stream through
  ``toLocalIterator`` so driver memory stays bounded at ``batch_size``.
* :func:`push_store` — thin runner executing those batches through the
  ``neo4j`` python driver. The import is gated: without the package the
  generators still work and ``push_store`` raises a clear ImportError.

Statement shapes:
* merge-mode nodes  → ``UNWIND $rows AS r MERGE (n:L {pk: r.__pk}) SET
  n += r.props, n._uid = r.__uid`` — same upsert key (primary_label, pk)
  as the engine's merge-agg and the reference's MERGE.
* create-mode nodes → ``UNWIND $rows AS r CREATE (n:L) SET ...``.
* all relationships → MATCH endpoints by the engine's ``_uid`` surrogate and
  ``MERGE`` on ``_eid`` — the edge identity already encodes pk / ghost /
  create semantics (plans/lowering.py eid derivation), so a re-push is
  idempotent for every mode.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

from pyspark.sql import DataFrame

from ..plans import lowering as L
from .neo4j_export import encode_key

BatchType = Tuple[str, List[Dict]]


def _node_statement(labels: Tuple[str, ...], merge: bool, pk_prop: str) -> str:
    label_frag = "".join(":" + encode_key(l) for l in labels)
    if merge:
        return (
            f"UNWIND $rows AS r MERGE (n{label_frag} "
            f"{{{encode_key(pk_prop)}: r.__pk}}) "
            "SET n += r.props, n._uid = r.__uid"
        )
    return (
        f"UNWIND $rows AS r CREATE (n{label_frag}) "
        "SET n = r.props, n._uid = r.__uid"
    )


def _edge_statement(rel_type: str) -> str:
    return (
        "UNWIND $rows AS r "
        "MATCH (a {_uid: r.__src}), (b {_uid: r.__dst}) "
        f"MERGE (a)-[e:{encode_key(rel_type)} {{_eid: r.__eid}}]->(b) "
        "SET e += r.props"
    )


def node_batches(nodes: DataFrame, batch_size: int = 1000) -> Iterator[BatchType]:
    """Stream the canonical node table as (cypher, rows) UNWIND batches,
    grouped by (label set, merge-mode, pk property)."""
    meta = set(L.NODE_META)
    prop_cols = [f.name for f in nodes.schema.fields if f.name not in meta]
    pending: Dict[Tuple, List[Dict]] = {}
    for row in nodes.toLocalIterator():
        d = row.asDict()
        labels = tuple(d[L.LABELS] or ())
        pk_prop = d[L.PKPROP]
        key = (labels, pk_prop)
        props = {k: d[k] for k in prop_cols if d[k] is not None}
        rec = {"__uid": d[L.UID], "props": props}
        if pk_prop is not None:
            rec["__pk"] = props.get(pk_prop)
        pending.setdefault(key, []).append(rec)
        if len(pending[key]) >= batch_size:
            yield _node_statement(labels, pk_prop is not None, pk_prop), pending.pop(key)
    for (labels, pk_prop), rows in pending.items():
        yield _node_statement(labels, pk_prop is not None, pk_prop), rows


def edge_batches(edges: DataFrame, batch_size: int = 1000) -> Iterator[BatchType]:
    """Stream the canonical edge table as (cypher, rows) UNWIND batches,
    grouped by relationship type."""
    meta = set(L.EDGE_META)
    prop_cols = [f.name for f in edges.schema.fields if f.name not in meta]
    pending: Dict[str, List[Dict]] = {}
    for row in edges.toLocalIterator():
        d = row.asDict()
        rel_type = d[L.RELTYPE]
        rec = {
            "__eid": d[L.EID],
            "__src": d[L.SRC_UID],
            "__dst": d[L.DST_UID],
            "props": {k: d[k] for k in prop_cols if d[k] is not None},
        }
        pending.setdefault(rel_type, []).append(rec)
        if len(pending[rel_type]) >= batch_size:
            yield _edge_statement(rel_type), pending.pop(rel_type)
    for rel_type, rows in pending.items():
        yield _edge_statement(rel_type), rows


def push_store(
    store,
    uri: str,
    auth: Tuple[str, str] = None,
    database: str = "neo4j",
    batch_size: int = 1000,
) -> Dict[str, int]:
    """Commit a GraphStore to a live Neo4j. Returns {'nodes': n, 'edges': m}.

    Requires the optional ``neo4j`` python driver. A uid index speeds the
    endpoint MATCHes; created if missing."""
    try:
        import neo4j
    except ImportError as exc:  # pragma: no cover - optional dependency
        raise ImportError(
            "push_store requires the optional 'neo4j' python driver "
            "(pip install neo4j); for driverless exports use "
            "sinks.neo4j_export (admin-import CSVs / Cypher statements)"
        ) from exc

    counts = {"nodes": 0, "edges": 0}
    driver = neo4j.GraphDatabase.driver(uri, auth=auth)
    try:
        with driver.session(database=database) as session:
            if store.nodes is not None:
                for stmt, rows in node_batches(store.nodes, batch_size):
                    session.run(stmt, rows=rows)
                    counts["nodes"] += len(rows)
            if store.edges is not None:
                for stmt, rows in edge_batches(store.edges, batch_size):
                    session.run(stmt, rows=rows)
                    counts["edges"] += len(rows)
    finally:
        driver.close()
    return counts
