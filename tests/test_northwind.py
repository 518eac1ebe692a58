"""Northwind-style realistic schema (reference examples/example_northwind.ipynb):
cross-table merge-on-key, MATCH joins, and the IF_HAS_BOSS conditional
relationship via a subgraph preprocessor (self-join on employees)."""

import pandas as pd
import pytest

from data2neo_spark import Converter, register_subgraph_preprocessor


@register_subgraph_preprocessor
def IF_HAS_BOSS(resource):
    if resource.get("ReportsTo") is None or pd.isna(resource.get("ReportsTo")):
        return None
    return resource


SCHEMA = """
ENTITY("employees"):
    NODE("Employee") emp:
        + id = INT(employees.EmployeeID)
        - first = employees.FirstName
        - last = employees.LastName
        - title = employees.Title
    IF_HAS_BOSS(RELATIONSHIP(emp, "REPORTS_TO", MATCH("Employee", id = INT(employees.ReportsTo)))):

ENTITY("products"):
    NODE("Product") prod:
        + id = INT(products.ProductID)
        - name = products.ProductName
        - price = FLOAT(products.UnitPrice)
    RELATIONSHIP(prod, "IN_CATEGORY", MATCH("Category", id = INT(products.CategoryID))):
    RELATIONSHIP(MATCH("Supplier", id = INT(products.SupplierID)), "SUPPLIES", prod):

ENTITY("categories"):
    NODE("Category") cat:
        + id = INT(categories.CategoryID)
        - name = categories.CategoryName

ENTITY("suppliers"):
    NODE("Supplier") sup:
        + id = INT(suppliers.SupplierID)
        - company = suppliers.CompanyName

ENTITY("orders"):
    MERGE_RELATIONSHIPS(RELATIONSHIP(MATCH("Employee", id = INT(orders.EmployeeID)), "SOLD", MATCH("Product", id = INT(orders.ProductID)))):
"""

EMPLOYEES = pd.DataFrame({
    "EmployeeID": [1, 2, 3],
    "FirstName": ["Nancy", "Andrew", "Janet"],
    "LastName": ["Davolio", "Fuller", "Leverling"],
    "Title": ["Rep", "VP", "Rep"],
    "ReportsTo": [2.0, None, 2.0],   # Fuller is the boss
})
CATEGORIES = pd.DataFrame({"CategoryID": [1, 2], "CategoryName": ["Beverages", "Condiments"]})
SUPPLIERS = pd.DataFrame({"SupplierID": [1], "CompanyName": ["Exotic Liquids"]})
PRODUCTS = pd.DataFrame({
    "ProductID": [1, 2, 3],
    "ProductName": ["Chai", "Chang", "Aniseed Syrup"],
    "UnitPrice": [18.0, 19.0, 10.0],
    "SupplierID": [1, 1, 1],
    "CategoryID": [1, 1, 2],
})
ORDERS = pd.DataFrame({
    "OrderID": [10, 11, 12, 13],
    "ProductID": [1, 1, 2, 3],
    "EmployeeID": [1, 1, 1, 3],
})


@pytest.fixture(scope="module")
def store(spark):
    return Converter(SCHEMA, [
        ("categories", spark.createDataFrame(CATEGORIES)),
        ("suppliers", spark.createDataFrame(SUPPLIERS)),
        ("employees", spark.createDataFrame(EMPLOYEES)),
        ("products", spark.createDataFrame(PRODUCTS)),
        ("orders", spark.createDataFrame(ORDERS)),
    ])(spark)


def test_node_counts(store):
    assert store.match_nodes("Employee").count() == 3
    assert store.match_nodes("Product").count() == 3
    assert store.match_nodes("Category").count() == 2
    assert store.match_nodes("Supplier").count() == 1


def test_conditional_self_join(store):
    """IF_HAS_BOSS: only employees with a boss get a REPORTS_TO edge, and the
    MATCH self-joins the Employee node table."""
    reports = store.match_relationships("REPORTS_TO").collect()
    assert len(reports) == 2
    assert {r["_src_key"] for r in reports} == {"1", "3"}
    assert {r["_dst_key"] for r in reports} == {"2"}


def test_cross_table_matches(store):
    cats = store.match_relationships("IN_CATEGORY").collect()
    assert len(cats) == 3
    assert sorted((r["_src_key"], r["_dst_key"]) for r in cats) == [
        ("1", "1"), ("2", "1"), ("3", "2")
    ]
    assert store.match_relationships("SUPPLIES").count() == 3


def test_merged_sales(store):
    """4 order rows, but (employee 1, product 1) repeats → 3 merged edges."""
    sold = store.match_relationships("SOLD").collect()
    assert len(sold) == 3
    assert sorted((r["_src_key"], r["_dst_key"]) for r in sold) == [
        ("1", "1"), ("1", "2"), ("3", "3")
    ]
