"""Source iterator tests, re-targeted from the reference
(tests/unit/relational_modules/test_sqlite.py, test_pandas.py)."""

import sqlite3

import pandas as pd
import pytest

from data2neo_spark import (
    Converter,
    IteratorIterator,
    PandasDataFrameIterator,
    SQLiteIterator,
)
from data2neo_spark.sources.iterators import ParquetTableIterator


def test_sqlite_iterator(spark, tmp_path):
    db = str(tmp_path / "test.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE person (id INTEGER PRIMARY KEY, name TEXT)")
    con.execute("CREATE TABLE pet (id INTEGER PRIMARY KEY, owner INTEGER)")
    con.executemany("INSERT INTO person VALUES (?, ?)", [(1, "a"), (2, "b")])
    con.executemany("INSERT INTO pet VALUES (?, ?)", [(10, 1)])
    con.commit()
    con.close()

    pairs = SQLiteIterator(db).resolve(spark)
    types = {t for t, _ in pairs}
    assert types == {"person", "pet"}
    dfs = dict(pairs)
    assert dfs["person"].count() == 2
    assert dfs["pet"].count() == 1

    filtered = SQLiteIterator(db, filter=["person"]).resolve(spark)
    assert [t for t, _ in filtered] == ["person"]


def test_sqlite_missing_pk_raises(spark, tmp_path):
    db = str(tmp_path / "nopk.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE nopk (x INTEGER)")
    con.commit()
    con.close()
    with pytest.raises(ValueError):
        SQLiteIterator(db).resolve(spark)


def test_sqlite_to_graph(spark, tmp_path):
    """SQLite tables flow through the full conversion (S2 end-to-end)."""
    db = str(tmp_path / "graph.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE person (id INTEGER PRIMARY KEY, name TEXT)")
    con.executemany("INSERT INTO person VALUES (?, ?)", [(1, "a"), (2, "b")])
    con.commit()
    con.close()
    schema = """
ENTITY("person"):
    NODE("Person") p:
        + id = INT(person.id)
        - name = person.name
"""
    store = Converter(schema, SQLiteIterator(db))(spark)
    assert store.match_nodes("Person").count() == 2


def test_iterator_iterator_order(spark):
    """Later iterators overwrite earlier on merge (order = merge order)."""
    v1 = PandasDataFrameIterator(pd.DataFrame({"id": [1], "name": ["old"]}), "T")
    v2 = PandasDataFrameIterator(pd.DataFrame({"id": [1], "name": ["new"]}), "T")
    schema = """
ENTITY("T"):
    NODE("N") n:
        + id = INT(T.id)
        - name = T.name
"""
    store = Converter(schema, IteratorIterator([v1, v2]))(spark)
    rows = store.nodes.collect()
    assert len(rows) == 1 and rows[0]["name"] == "new"


def test_parquet_iterator(spark):
    it = ParquetTableIterator("/root/testdata/sf0.001/region.parquet", "region")
    pairs = it.resolve(spark)
    assert pairs[0][0] == "region"
    assert pairs[0][1].count() == 5
