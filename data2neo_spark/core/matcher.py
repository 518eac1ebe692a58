"""Standalone Matcher — API parity with the reference's top-level export.

The reference exposes ``Matcher`` at the package root
(reference __init__.py:12, core/factories/matcher.py:11-103): a reusable
node-matching spec (labels + property conditions) resolved against the
graph per resource via a Cypher round-trip. In the columnar engine, MATCH
inside RELATIONSHIP rules lowers to hash joins (plans/lowering.py
lower_match); this class covers the *standalone* use — "give me the nodes
matching these labels/conditions" — as one DataFrame filter against a
GraphStore.

Divergence (documented): conditions are literal values, not
AttributeFactory objects — the per-resource dynamic form is the schema DSL's
``MATCH(...)``, which compiles to joins instead of per-row queries.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


class Matcher:
    """A reusable (labels, conditions) node query.

    Args:
        *labels: node labels that must all be present.
        **conditions: property = value equality conditions.

    Like the reference's ``Matcher.graph_driver`` static hook, a default
    ``GraphStore`` can be installed once via ``Matcher.graph_store = store``;
    ``match()`` may also be given an explicit store.
    """

    graph_store = None  # class-level default, mirrors Matcher.graph_driver

    def __init__(self, *labels: str, **conditions) -> None:
        if not labels and not conditions:
            raise ValueError(
                "Matcher: Either node_id and labels or conditions must be provided"
            )
        self._labels = labels
        self._conditions = conditions

    def match(self, store: Optional["GraphStore"] = None) -> DataFrame:
        """Matching nodes as a DataFrame (canonical node-table columns)."""
        store = store if store is not None else Matcher.graph_store
        if store is None:
            raise ValueError(
                "Matcher: no GraphStore — pass one to match() or set "
                "Matcher.graph_store"
            )
        return store.match_nodes(*self._labels, **self._conditions)
