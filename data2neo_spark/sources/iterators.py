"""Resource iterators — typed row-stream sources.

The reference streams python Resource objects
(/root/reference/data2neo/core/resource_iterator.py:17-59,
relational_modules/pandas.py:74-87, relational_modules/sqlite.py:81-196).
Here an "iterator" resolves to an ordered list of (entity_type, DataFrame)
pairs; re-iterability (node pass then relationship pass, reference
docs/source/resource.rst:69-70) is free — a DataFrame is re-computable
lineage. Order across sources matters: it defines the deterministic
last-writer-wins sequence for merge-on-key.
"""

from __future__ import annotations

import sqlite3
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession


class ResourceIterator:
    """Base: resolves to ordered (entity_type, DataFrame) pairs."""

    def resolve(self, spark: SparkSession) -> List[Tuple[str, DataFrame]]:
        raise NotImplementedError


class SparkDataFrameIterator(ResourceIterator):
    """Wrap an existing DataFrame as a typed resource stream (S1)."""

    def __init__(self, df: DataFrame, entity_type: str) -> None:
        self._df = df
        self._type = entity_type

    def resolve(self, spark: SparkSession) -> List[Tuple[str, DataFrame]]:
        return [(self._type, self._df)]


class PandasDataFrameIterator(ResourceIterator):
    """Wrap a pandas DataFrame (reference relational_modules/pandas.py:74-87).

    Copy-on-write is inherent: createDataFrame snapshots the frame.
    """

    def __init__(self, df, entity_type: str) -> None:
        self._pdf = df
        self._type = entity_type

    def resolve(self, spark: SparkSession) -> List[Tuple[str, DataFrame]]:
        return [(self._type, spark.createDataFrame(self._pdf))]


class ParquetTableIterator(ResourceIterator):
    """Scan a parquet file/dir as one entity type (S5-adjacent)."""

    def __init__(self, path: str, entity_type: str) -> None:
        self._path = path
        self._type = entity_type

    def resolve(self, spark: SparkSession) -> List[Tuple[str, DataFrame]]:
        return [(self._type, spark.read.parquet(self._path))]


class SQLiteIterator(ResourceIterator):
    """All tables (or a filter list) of a sqlite db, one entity type per
    table (reference relational_modules/sqlite.py:81-196).

    Primary keys are auto-discovered via ``PRAGMA table_info``; a table
    without a PK raises ValueError (reference sqlite.py:119-126). Data is
    loaded through pandas on the driver — sqlite is a single-file source, so
    there is nothing to distribute at read time; Spark parallelism starts at
    the transform. ``mix_tables`` round-robin interleaving (sqlite.py:148-182)
    is irrelevant under Spark's order-independent semantics and not exposed.
    """

    def __init__(self, sqlite_file: str, filter: Optional[Sequence[str]] = None) -> None:
        self._file = sqlite_file
        self._filter = list(filter) if filter is not None else None

    def resolve(self, spark: SparkSession) -> List[Tuple[str, DataFrame]]:
        import pandas as pd

        con = sqlite3.connect(self._file)
        try:
            tables = [
                r[0]
                for r in con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                ).fetchall()
            ]
            if self._filter is not None:
                tables = [t for t in tables if t in self._filter]
            out: List[Tuple[str, DataFrame]] = []
            for table in tables:
                info = con.execute(f"PRAGMA table_info({table})").fetchall()
                pks = [row[1] for row in info if row[5] > 0]
                if not pks:
                    raise ValueError(
                        f"SQLiteIterator: table '{table}' has no primary key"
                    )
                pdf = pd.read_sql_query(f"SELECT * FROM {table}", con)
                out.append((table, spark.createDataFrame(pdf)))
            return out
        finally:
            con.close()


class IteratorIterator(ResourceIterator):
    """Concatenation of iterators, recursively (reference
    resource_iterator.py:38-59). Order preserved — it defines merge order."""

    def __init__(self, iterators: Sequence[ResourceIterator]) -> None:
        self._iterators = list(iterators)

    def resolve(self, spark: SparkSession) -> List[Tuple[str, DataFrame]]:
        out: List[Tuple[str, DataFrame]] = []
        for it in self._iterators:
            out.extend(it.resolve(spark))
        return out
