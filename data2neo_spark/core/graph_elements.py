"""Property-graph value model (driver-side + inside Arrow batches).

Mirrors the *semantics* of the reference's graph elements
(/root/reference/data2neo/neo4j/graph_elements.py) without any Neo4j
dependency:

* ``Attribute`` — immutable (key, value) pair.
* ``Node`` — label set (first label = primary label), open property dict,
  optional primary key.
* ``Relationship`` — (start_node, type, end_node, properties, optional pk).
* ``Subgraph`` — set of nodes and relationships with ``| & - ^`` algebra;
  endpoint nodes of contained relationships are auto-included
  (reference graph_elements.py:150-155).

Value coercion rule (reference graph_elements.py:84-86): values that are not
str/int/float/bool/date/datetime are coerced to ``str(value)``.

These objects exist for the wrapper/UDF surface (subgraph pre/post processors
receive and return them inside ``mapInPandas`` Arrow batches) and for unit-test
parity; the bulk dataflow never materializes them — it stays in DataFrames.
"""

from __future__ import annotations

import datetime
from numbers import Number
from typing import Any, Dict, Iterable, List, Optional, Set, Tuple


class GhostPrimaryKey:
    """Marker: merge a relationship on (src, type, dst) with no key property.

    Reference: graph_elements.py:89-94 (_GhostPrimaryKey), applied by
    MERGE_RELATIONSHIPS (common_modules/__init__.py:17-26).
    """

    def __repr__(self) -> str:  # pragma: no cover
        return "<GhostPrimaryKey>"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, GhostPrimaryKey)

    def __hash__(self) -> int:
        return hash("__ghost_pk__")


def coerce_value(value: Any) -> Any:
    """Coerce a property value to a graph-storable type.

    str/int/float/bool/date/datetime pass through (datetime loses tzinfo,
    matching the reference's DATETIME wrapper, common_modules/datetime.py:15);
    anything else becomes ``str(value)`` (graph_elements.py:84-86).
    """
    if isinstance(value, bool) or isinstance(value, str) or isinstance(value, Number):
        return value
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None)
    if isinstance(value, datetime.date):
        return value
    if value is None:
        return None
    return str(value)


class Attribute:
    """An immutable key/value pair (reference graph_elements.py:56-87)."""

    __slots__ = ("_key", "_value")

    def __init__(self, key: str, value: Any) -> None:
        self._key = key
        self._value = coerce_value(value)

    @property
    def key(self) -> str:
        return self._key

    @property
    def value(self) -> Any:
        return self._value

    def __repr__(self) -> str:  # pragma: no cover
        return f"Attribute({self._key!r}, {self._value!r})"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Attribute)
            and other._key == self._key
            and other._value == self._value
        )

    def __hash__(self) -> int:
        return hash((self._key, self._value))


class _Element:
    """Shared behavior of Node and Relationship: an open property dict."""

    def __init__(self, properties: Optional[Dict[str, Any]] = None) -> None:
        self._properties: Dict[str, Any] = {}
        if properties:
            for k, v in properties.items():
                self._properties[k] = coerce_value(v)
        self.__primarykey__: Any = None
        # surrogate identity (the engine's replacement for Neo4j id(n));
        # assigned when the element round-trips through the GraphStore.
        self.identity: Optional[int] = None

    @property
    def properties(self) -> Dict[str, Any]:
        return self._properties

    def __getitem__(self, key: str) -> Any:
        return self._properties[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._properties[key] = coerce_value(value)

    def get(self, key: str, default: Any = None) -> Any:
        return self._properties.get(key, default)

    def keys(self) -> Iterable[str]:
        return self._properties.keys()

    def set_primary_key(self, key: Any) -> None:
        self.__primarykey__ = key

    def __or__(self, other: Any) -> "Subgraph":
        # py2neo-style algebra: n1 | n2 | r1 builds a Subgraph (reference
        # test_match.py:36 fixture)
        return Subgraph._as_subgraph(self) | other


class Node(_Element):
    """A property-graph node.

    ``labels`` is an ordered-unique list; the first label is the primary
    label (reference graph_elements.py:505-507). ``__primarykey__`` names an
    existing property used for merge-on-key (validated like
    graph_elements.py:424-428).
    """

    def __init__(
        self,
        *labels: str,
        **properties: Any,
    ) -> None:
        super().__init__(properties)
        self._labels: List[str] = []
        for lbl in labels:
            if lbl not in self._labels:
                self._labels.append(str(lbl))

    @classmethod
    def from_attributes(
        cls,
        labels: Iterable["Attribute"],
        attributes: Iterable["Attribute"],
        primary_key: Optional[str] = None,
    ) -> "Node":
        node = cls(*[a.value for a in labels])
        for attr in attributes:
            node[attr.key] = attr.value
        if primary_key is not None:
            if primary_key not in node.properties:
                raise ValueError(
                    f"The primary key '{primary_key}' must refer to an existing "
                    f"property of the node (properties: {sorted(node.properties)})"
                )
            node.set_primary_key(primary_key)
        return node

    @property
    def labels(self) -> List[str]:
        return list(self._labels)

    @property
    def __primarylabel__(self) -> Optional[str]:
        return self._labels[0] if self._labels else None

    def add_label(self, label: str) -> None:
        if label not in self._labels:
            self._labels.append(str(label))

    def _key(self) -> Tuple:
        return (
            tuple(sorted(self._labels)),
            tuple(sorted((k, repr(v)) for k, v in self._properties.items())),
            id(self) if self.__primarykey__ is None else
            (self.__primarylabel__, self.__primarykey__,
             repr(self._properties.get(self.__primarykey__))),
        )

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Node) and other is self or (
            isinstance(other, Node) and other._key() == self._key()
        )

    def __hash__(self) -> int:
        return hash(self._key())

    def __repr__(self) -> str:  # pragma: no cover
        return f"Node({':'.join(self._labels)} {self._properties!r})"


class Relationship(_Element):
    """A property-graph relationship (reference graph_elements.py:558-668)."""

    def __init__(
        self,
        start_node: Node,
        type: str,
        end_node: Node,
        **properties: Any,
    ) -> None:
        super().__init__(properties)
        self.start_node = start_node
        self.end_node = end_node
        self._type = str(type)

    @classmethod
    def from_attributes(
        cls,
        start_node: Node,
        type_attr: "Attribute",
        end_node: Node,
        attributes: Iterable["Attribute"] = (),
        primary_key: Optional[str] = None,
    ) -> "Relationship":
        rel = cls(start_node, type_attr.value, end_node)
        for attr in attributes:
            rel[attr.key] = attr.value
        if primary_key is not None:
            rel.set_primary_key(primary_key)
        return rel

    @property
    def type(self) -> str:
        return self._type

    def __repr__(self) -> str:  # pragma: no cover
        return f"Relationship({self.start_node!r}-[:{self._type} {self._properties!r}]->{self.end_node!r})"

    def __eq__(self, other: object) -> bool:
        return self is other

    def __hash__(self) -> int:
        return id(self)


class Subgraph:
    """A set of nodes plus a set of relationships with set algebra.

    Endpoints of every relationship are auto-included in ``nodes``
    (reference graph_elements.py:150-155). Supports ``| & - ^``
    (reference graph_elements.py:359-373).
    """

    def __init__(
        self,
        nodes: Iterable[Node] = (),
        relationships: Iterable[Relationship] = (),
    ) -> None:
        # insertion-ordered unique (dict-as-ordered-set): the reference's
        # subgraph postprocessors index into ``subgraph.nodes[0]``
        # (tests/integration/test_wrappers.py:92-96)
        self._nodes: Dict[Node, None] = dict.fromkeys(nodes)
        self._relationships: Dict[Relationship, None] = dict.fromkeys(relationships)
        for rel in self._relationships:
            self._nodes.setdefault(rel.start_node)
            self._nodes.setdefault(rel.end_node)

    @property
    def nodes(self) -> List[Node]:
        return list(self._nodes)

    @property
    def relationships(self) -> List[Relationship]:
        return list(self._relationships)

    @staticmethod
    def _as_subgraph(other: Any) -> "Subgraph":
        if isinstance(other, Subgraph):
            return other
        if isinstance(other, Node):
            return Subgraph([other])
        if isinstance(other, Relationship):
            return Subgraph([], [other])
        raise TypeError(f"Cannot combine Subgraph with {type(other)!r}")

    def __or__(self, other: Any) -> "Subgraph":
        o = self._as_subgraph(other)
        return Subgraph(
            list(self._nodes) + list(o._nodes),
            list(self._relationships) + list(o._relationships),
        )

    __ror__ = __or__

    def __and__(self, other: Any) -> "Subgraph":
        o = self._as_subgraph(other)
        return Subgraph(
            [n for n in self._nodes if n in o._nodes],
            [r for r in self._relationships if r in o._relationships],
        )

    def __sub__(self, other: Any) -> "Subgraph":
        o = self._as_subgraph(other)
        return Subgraph(
            [n for n in self._nodes if n not in o._nodes],
            [r for r in self._relationships if r not in o._relationships],
        )

    def __xor__(self, other: Any) -> "Subgraph":
        o = self._as_subgraph(other)
        return Subgraph(
            [n for n in self._nodes if n not in o._nodes]
            + [n for n in o._nodes if n not in self._nodes],
            [r for r in self._relationships if r not in o._relationships]
            + [r for r in o._relationships if r not in self._relationships],
        )

    def __len__(self) -> int:
        return len(self._nodes) + len(self._relationships)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Subgraph(nodes={len(self._nodes)}, relationships={len(self._relationships)})"
