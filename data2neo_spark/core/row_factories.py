"""Row-level factory interpreter — the Arrow fallback path for rules whose
wrappers cannot be vectorized (full wrapper classes, general subgraph
postprocessors).

Mirrors the reference's factory execution semantics
(/root/reference/data2neo/core/factories/factory.py:154-242,
factory_wrappers.py:21-142) per row, but runs *inside* ``mapInPandas`` over
Arrow batches — rules on the hot path never touch this module; the compiler
routes a rule here only when it detects a non-vectorizable wrapper.

Public classes ``AttributeFactoryWrapper`` / ``SubgraphFactoryWrapper`` are
the user-facing base classes for ``register_wrapper``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

from . import registrar
from .graph_elements import Attribute, Node, Relationship, Subgraph


class Resource(dict):
    """Dict-backed resource row. ``__getitem__`` raises ValueError for
    missing columns (reference relational_modules/pandas.py:47-57);
    wrappers may add new keys."""

    def __getitem__(self, key: str) -> Any:
        try:
            return super().__getitem__(key)
        except KeyError:
            raise ValueError(
                f"Resource: Error while extracting the attribute {key}"
            )

    @property
    def supplies(self) -> Dict[str, Any]:
        return self.setdefault("__supplies__", {})


class RowAttributeFactory:
    """AttributeFactory semantics (reference factory.py:85-150)."""

    def __init__(self, attribute_key, entity_attribute, static_attribute_value=None):
        self.attribute_key = attribute_key
        self.entity_attribute = entity_attribute
        self.static_attribute_value = static_attribute_value

    def construct(self, resource) -> Optional[Attribute]:
        if resource is None:
            return None
        if self.static_attribute_value is not None:
            return Attribute(self.attribute_key, self.static_attribute_value)
        return Attribute(self.attribute_key, resource[self.entity_attribute])


class RowNodeFactory:
    """NodeFactory semantics (reference factory.py:154-187)."""

    def __init__(self, attributes, labels, primary_key=None, identifier=None):
        self.attributes = attributes
        self.labels = labels
        self.primary_key = primary_key
        self.identifier = identifier

    def construct(self, resource) -> Subgraph:
        if resource is None:
            return Subgraph()
        labels = [lf.construct(resource) for lf in self.labels]
        attrs = [af.construct(resource) for af in self.attributes]
        node = Node.from_attributes(
            [l for l in labels if l is not None],
            [a for a in attrs if a is not None],
            self.primary_key,
        )
        return Subgraph([node])


class AttributeFactoryWrapper:
    """Base class for full attribute wrappers (reference
    factory_wrappers.py:105-142). Subclass and override ``construct``;
    ``super().construct(resource)`` runs the wrapped factory."""

    def __init__(self, factory, preprocessor: Callable = None, postprocessor: Callable = None):
        self.factory = factory
        self._preprocessor = preprocessor
        self._postprocessor = postprocessor

    def construct(self, resource) -> Optional[Attribute]:
        if resource is None:
            return None
        if self._preprocessor is not None:
            resource = self._preprocessor(resource)
        attr = self.factory.construct(resource)
        if self._postprocessor is not None and attr is not None:
            attr = self._postprocessor(attr)
        return attr


class SubgraphFactoryWrapper:
    """Base class for full subgraph wrappers (reference
    factory_wrappers.py:66-101)."""

    def __init__(self, factory, preprocessor: Callable = None, postprocessor: Callable = None):
        self.factory = factory
        self._preprocessor = preprocessor
        self._postprocessor = postprocessor

    def construct(self, resource) -> Subgraph:
        if resource is None:
            return Subgraph()
        if self._preprocessor is not None:
            resource = self._preprocessor(resource)
            if resource is None:
                return Subgraph()
        subgraph = self.factory.construct(resource)
        if self._postprocessor is not None:
            subgraph = self._postprocessor(subgraph)
        return subgraph


def build_attribute_constructor(spec) -> Any:
    """AttrSpec → a factory object with reference wrapper semantics."""
    factory: Any = RowAttributeFactory(spec.key, spec.column, spec.static)
    for w in reversed(spec.wrappers):  # innermost-first application
        wdef = registrar.get_wrapper(w.name)
        sargs = tuple(w.static_args)
        if wdef.kind == registrar.ATTR_PRE:
            factory = AttributeFactoryWrapper(
                factory, preprocessor=_bind_pre(wdef.fn, sargs)
            )
        elif wdef.kind in (registrar.ATTR_POST, registrar.ATTR_POST_VEC):
            factory = AttributeFactoryWrapper(
                factory, postprocessor=_bind_post(wdef.fn, sargs)
            )
        elif wdef.kind == registrar.FULL_WRAPPER:
            factory = wdef.fn(factory, *sargs)
        else:
            raise ValueError(
                f"Wrapper '{w.name}' of kind {wdef.kind} cannot wrap an attribute"
            )
    return factory


def _bind_pre(fn, sargs):
    return lambda resource: fn(resource, *sargs)


def _bind_post(fn, sargs):
    return lambda x: fn(x, *sargs)


def build_node_constructor(rule) -> Any:
    """NodeRule → a factory-object chain (for the dynamic mapInPandas path)."""
    inner: Any = RowNodeFactory(
        [build_attribute_constructor(s) for s in rule.attributes],
        [build_attribute_constructor(s) for s in rule.labels],
        rule.primary_key,
        rule.identifier,
    )
    for w in reversed(rule.wrappers):
        wdef = registrar.get_wrapper(w.name)
        sargs = tuple(w.static_args)
        if wdef.kind == registrar.SG_PRE:
            inner = SubgraphFactoryWrapper(inner, preprocessor=_bind_pre(wdef.fn, sargs))
        elif wdef.kind == registrar.SG_POST:
            inner = SubgraphFactoryWrapper(inner, postprocessor=_bind_post(wdef.fn, sargs))
        elif wdef.kind == registrar.FULL_WRAPPER:
            inner = wdef.fn(inner, *sargs)
        else:
            raise ValueError(
                f"Wrapper '{w.name}' of kind {wdef.kind} cannot wrap a graph element"
            )
    return inner
