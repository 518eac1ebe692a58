"""GlobalSharedState — read-only shared state for wrapper functions (O7).

Reference (core/global_state.py:12-50): a singleton whose attributes are
distributed to worker processes; wrappers read configuration/lookup data from
it. Our executors are Spark python workers, so the state is snapshotted on
the driver at lowering time, shipped inside the UDF closures, and installed
before user wrapper code runs.

Divergence (documented, by design): mutations made on executors are local to
the task — arbitrary mutable cross-worker state (mp.Manager objects, shared
locks) is intentionally unsupported. Use Spark accumulators for counters.
The reference's own docs warn wrappers must be dependency-free
(docs/source/converter.rst:48-49).
"""

from __future__ import annotations

from typing import Any, Dict


class _StateMeta(type):
    _custom_global_vars: Dict[str, Any] = {}

    def __getattr__(cls, name: str) -> Any:
        if name.startswith("__"):
            raise AttributeError(name)
        try:
            return cls._custom_global_vars[name]
        except KeyError:
            raise AttributeError("No such global variable: " + name)

    def __setattr__(cls, name: str, value: Any) -> None:
        if name == "_custom_global_vars":
            raise AttributeError(f"Cannot set {name}. Forbidden attribute.")
        cls._custom_global_vars[name] = value

    def __delattr__(cls, name: str) -> None:
        del cls._custom_global_vars[name]

    def keys(cls):
        return cls._custom_global_vars.keys()

    def get_state(cls) -> Dict[str, Any]:
        return dict(cls._custom_global_vars)

    def set_state(cls, state: Dict[str, Any]) -> None:
        cls._custom_global_vars.update(state)


class GlobalSharedState(metaclass=_StateMeta):
    pass


def snapshot() -> Dict[str, Any]:
    """Driver-side snapshot to embed in UDF closures."""
    return GlobalSharedState.get_state()


def install(state: Dict[str, Any]) -> None:
    """Executor-side: make the snapshot visible to user wrapper code."""
    GlobalSharedState.set_state(state)
