from .parser import parse_schema, SchemaConfigParser, SchemaConfigException, precompile
from .compiler import compile_schema

__all__ = [
    "parse_schema",
    "SchemaConfigParser",
    "SchemaConfigException",
    "precompile",
    "compile_schema",
]
