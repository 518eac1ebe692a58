"""Built-in schema modules: type casts, date parsing, relationship merging.

Reference counterparts: data2neo/common_modules/types.py:12-26 (INT/FLOAT/
STR/BOOL), common_modules/datetime.py:12-22 (DATE/DATETIME),
common_modules/__init__.py:17-33 (MERGE_RELATIONSHIPS / MERGE_RELATIONS).

Each built-in is registered twice over:

* a plain python function over Attribute objects (driver-side parity and the
  Arrow fallback path), and
* a native Column compiler so the vectorized path stays inside Tungsten
  whole-stage codegen — no python in the hot loop.

Bug-compatibility notes (deliberate, tested by the reference):
* ``BOOL("False") is True`` — python truthiness of a non-empty string
  (reference tests/unit/common_modules/test_type_conversions.py:48-55);
* ``STR(True) == "True"`` — python capitalization, not SQL ``true``;
* DATETIME strips tzinfo (common_modules/datetime.py:15,21).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import registrar
from ..core.graph_elements import Attribute
from ..core.registrar import ATTR_POST, SG_POST

# --------------------------------------------------------------------------
# strptime → Spark datetime-pattern translation
# --------------------------------------------------------------------------

_STRPTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%b": "MMM",
    "%B": "MMMM",
    "%a": "EEE",
    "%A": "EEEE",
    "%j": "DDD",
    "%z": "xx",
    "%%": "%",
}


def strptime_to_spark(fmt: str) -> str:
    """Translate a python strptime format to a Spark datetime pattern.

    Literal alphabetic characters are single-quoted (Spark treats bare
    letters as pattern symbols): ``%Y-%m-%dT%H:%M:%S`` →
    ``yyyy-MM-dd'T'HH:mm:ss``.
    """
    out = []
    literal = []

    def flush_literal():
        if literal:
            import re
            text = "".join(literal).replace("'", "''")
            # quote alphabetic runs only (Spark reserves bare letters)
            text = re.sub(r"[A-Za-z]+", lambda m: f"'{m.group()}'", text)
            out.append(text)
            literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            directive = fmt[i:i + 2]
            if directive in _STRPTIME_TO_SPARK:
                flush_literal()
                out.append(_STRPTIME_TO_SPARK[directive])
                i += 2
                continue
        literal.append(fmt[i])
        i += 1
    flush_literal()
    return "".join(out)


# --------------------------------------------------------------------------
# helpers shared with the lowering layer
# --------------------------------------------------------------------------

from ..core.types import python_str_column  # noqa: E402  (python str(True)='True' semantics)


def python_bool_column(col: Column, dtype: T.DataType) -> Column:
    """python truthiness as a Column (NOT SQL cast semantics)."""
    if isinstance(dtype, T.BooleanType):
        return col
    if isinstance(dtype, T.StringType):
        # bug-compat: BOOL("False") == True (non-empty string is truthy)
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.length(col) > 0
        )
    if isinstance(dtype, (T.NumericType,)):
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(col != 0)
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(F.lit(True))


# --------------------------------------------------------------------------
# built-in python fns (Attribute → Attribute)
# --------------------------------------------------------------------------

def INT(attribute: Attribute) -> Attribute:
    return Attribute(attribute.key, int(attribute.value))


def FLOAT(attribute: Attribute) -> Attribute:
    return Attribute(attribute.key, float(attribute.value))


def STR(attribute: Attribute) -> Attribute:
    return Attribute(attribute.key, str(attribute.value))


def BOOL(attribute: Attribute) -> Attribute:
    return Attribute(attribute.key, bool(attribute.value))


def DATETIME(attribute: Attribute, format_string: str = "%Y-%m-%dT%H:%M:%S") -> Attribute:
    if isinstance(attribute.value, _dt.datetime):
        return Attribute(attribute.key, attribute.value.replace(tzinfo=None))
    return Attribute(attribute.key, _dt.datetime.strptime(attribute.value, format_string))


def DATE(attribute: Attribute, format_string: str = "%Y-%m-%dT%H:%M:%S") -> Attribute:
    if isinstance(attribute.value, _dt.datetime):
        return Attribute(attribute.key, attribute.value.replace(tzinfo=None).date())
    if isinstance(attribute.value, _dt.date):
        return Attribute(attribute.key, attribute.value)
    return Attribute(attribute.key, _dt.datetime.strptime(attribute.value, format_string).date())


# --------------------------------------------------------------------------
# native Column compilers
# --------------------------------------------------------------------------

def _int_col(col: Column, dtype: T.DataType) -> Column:
    # try_cast: NaN / overflow / unparseable → null (property absent) instead
    # of an ANSI-mode task failure; mirrors the reference dropping attributes
    # whose factory returns None
    return col.try_cast("long")


def _float_col(col: Column, dtype: T.DataType) -> Column:
    return col.try_cast("double")


def _datetime_col(col: Column, dtype: T.DataType, fmt: str = "%Y-%m-%dT%H:%M:%S") -> Column:
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return col
    if isinstance(dtype, T.DateType):
        return col.cast("timestamp")
    return F.to_timestamp(col, strptime_to_spark(fmt))


def _date_col(col: Column, dtype: T.DataType, fmt: str = "%Y-%m-%dT%H:%M:%S") -> Column:
    if isinstance(dtype, T.DateType):
        return col
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("date")
    return F.to_date(col, strptime_to_spark(fmt))


def _merge_relationships(subgraph):
    """Arrow-path fallback: flag rels for (src, type, dst) merge.

    The compiler normally folds this wrapper into RelRule.ghost_primary_key
    (compile-time dedup-mode switch) so this function never runs per row.
    """
    from ..core.graph_elements import GhostPrimaryKey

    for rel in subgraph.relationships:
        if getattr(rel, "__primarykey__", None) is None:
            rel.set_primary_key(GhostPrimaryKey())
    return subgraph


registrar.register_native("INT", ATTR_POST, INT, _int_col)
registrar.register_native("FLOAT", ATTR_POST, FLOAT, _float_col)
registrar.register_native("STR", ATTR_POST, STR, python_str_column)
registrar.register_native("BOOL", ATTR_POST, BOOL, python_bool_column)
registrar.register_native("DATETIME", ATTR_POST, DATETIME, _datetime_col)
registrar.register_native("DATE", ATTR_POST, DATE, _date_col)
registrar.register_native(
    "MERGE_RELATIONSHIPS", SG_POST, _merge_relationships,
    sets_ghost_primary_key=True,
)
registrar.register_native(
    "MERGE_RELATIONS", SG_POST, _merge_relationships,
    sets_ghost_primary_key=True,
)
