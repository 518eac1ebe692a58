from .rules import AttrSpec, WrapperApplication, MatchSpec, NodeRule, RelRule, EntityRules, CompiledSchema

__all__ = [
    "AttrSpec",
    "WrapperApplication",
    "MatchSpec",
    "NodeRule",
    "RelRule",
    "EntityRules",
    "CompiledSchema",
]
