"""Parser golden tests, re-targeted from the reference suite
(/root/reference/tests/unit/core/test_schema_compiler.py) — exact instruction
trees and error messages. No Spark needed."""

import pytest

from data2neo_spark.schema.parser import (
    SchemaConfigParser,
    SchemaConfigException,
    precompile,
    parse_schema,
)


def test_precompile_commentremoval():
    input_string = 'a = 1 # comment\nb = 2 #### x\n# whole line ,!\'_\nc\n'
    assert precompile(input_string) == 'a = 1 \nb = 2 \n\nc\n'


def test_parser_complex():
    """Exact golden tree from reference test_schema_compiler.py:61-97."""
    input_string = """
    ENTITY("entity"):
    WRAPPER(NODE("label", WRAP("label2"), WRAP("label3", 1234), entity.column), "someargument", 123) nodeid:
        + test = entity.column
        - test1 = "static \\" string"
        - test2 = WRAP2(WRAP(entity.col))
    RELATIONSHIP(MATCH("label", "label2", name="test", id=WRAP(test.idcolumn)), "type", to):
        + test = entity.column
        - test1 = "static \\" string"
        - test2 = WRAP2(WRAP(entity.col))
    ENTITY("second"):
        RELATIONSHIP(MATCH("label", "label2", name="test", id=WRAP(test.idcolumn)), "type", to):
        + test = entity.column
        - test1 = "static \\" string"
        - test2 = WRAP2(WRAP(entity.col))
    ENTITY("third"):
    """
    ground_truth = [['entity', [[['WRAPPER', [['NodeFactory', [[['AttributeFactory', ['test', 'column', None]], ['AttributeFactory', ['test1', None, 'static \\" string']], ['WRAP2', [['WRAP', [['AttributeFactory', ['test2', 'col', None]]]]]]], [['AttributeFactory', [None, None, 'label']], ['WRAP', [['AttributeFactory', [None, None, 'label2']]]], ['WRAP', [['AttributeFactory', [None, None, 'label3']], ['AttributeFactory', [None, None, 1234]]]], ['AttributeFactory', [None, 'column', None]]], 'test', 'nodeid']], ['AttributeFactory', [None, None, 'someargument']], ['AttributeFactory', [None, None, 123]]]]], [['RelationshipFactory', [[['AttributeFactory', ['test', 'column', None]], ['AttributeFactory', ['test1', None, 'static \\" string']], ['WRAP2', [['WRAP', [['AttributeFactory', ['test2', 'col', None]]]]]]], ['AttributeFactory', [None, None, 'type']], ['Matcher', [None, ['AttributeFactory', [None, None, 'label']], ['AttributeFactory', [None, None, 'label2']], ['AttributeFactory', ['name', None, 'test']], ['WRAP', [['AttributeFactory', ['id', 'idcolumn', None]]]]]], ['Matcher', ['to']], 'test', None]]]]], ['second', [[], [['RelationshipFactory', [[['AttributeFactory', ['test', 'column', None]], ['AttributeFactory', ['test1', None, 'static \\" string']], ['WRAP2', [['WRAP', [['AttributeFactory', ['test2', 'col', None]]]]]]], ['AttributeFactory', [None, None, 'type']], ['Matcher', [None, ['AttributeFactory', [None, None, 'label']], ['AttributeFactory', [None, None, 'label2']], ['AttributeFactory', ['name', None, 'test']], ['WRAP', [['AttributeFactory', ['id', 'idcolumn', None]]]]]], ['Matcher', ['to']], 'test', None]]]]], ['third', [[], []]]]
    parser = SchemaConfigParser()
    assert ground_truth == parser.parse(input_string)


def test_parser_nodes_with_same_labels():
    input_string = """
    ENTITY("LegislativePeriod"):
    NODE("Source"):
        + name = "Online DB"
    NODE("Source"):
        + name = "Amtliche Sammlung"
    NODE("Source"):
        + name = "Bundesblatt"
    """
    ground_truth = [['LegislativePeriod', [[['NodeFactory', [[['AttributeFactory', ['name', None, 'Online DB']]], [['AttributeFactory', [None, None, 'Source']]], 'name', None]], ['NodeFactory', [[['AttributeFactory', ['name', None, 'Amtliche Sammlung']]], [['AttributeFactory', [None, None, 'Source']]], 'name', None]], ['NodeFactory', [[['AttributeFactory', ['name', None, 'Bundesblatt']]], [['AttributeFactory', [None, None, 'Source']]], 'name', None]]], []]]]
    parser = SchemaConfigParser()
    assert ground_truth == parser.parse(input_string)


def test_parser_overlapping_identifiers():
    input_string = """
    ENTITY("Session"):
    NODE("Year") year:
    NODE("Year") year_end:
    """
    ground_truth = [['Session', [[['NodeFactory', [[], [['AttributeFactory', [None, None, 'Year']]], None, 'year']], ['NodeFactory', [[], [['AttributeFactory', [None, None, 'Year']]], None, 'year_end']]], []]]]
    parser = SchemaConfigParser()
    assert ground_truth == parser.parse(input_string)


def test_parser_raises_identifier_twice():
    input_string = """
    ENTITY('entity'):
        NODE("label") node:
        NODE("label2") node:
    """
    with pytest.raises(SchemaConfigException) as excinfo:
        SchemaConfigParser().parse(input_string)
    assert excinfo.value.args[0] == (
        "Found conflicting definitions of identifiers ['node'] in entity "
        "'entity'. An identifier must be unique."
    )


def test_parser_raises_two_primary_keys():
    input_string = """
    ENTITY('entity'):
        NODE("label") node:
            + name = entity.attr
            + name2 = entity.attr
    """
    with pytest.raises(SchemaConfigException) as excinfo:
        SchemaConfigParser().parse(input_string)
    assert excinfo.value.args[0] == (
        "Setting two or more primary keys for one graphelement is not "
        "allowed. Conflict: 'name' <-> 'name2'"
    )


def test_parser_raises_illegal_character():
    input_string = """
    ENTITY('entity') @whatisthis:
        NODE("label") node:
    """
    with pytest.raises(SchemaConfigException) as excinfo:
        SchemaConfigParser().parse(input_string)
    assert excinfo.value.args[0].startswith("Illegal character '@' on line 2")


def test_parser_raises_illegal_token():
    input_string = """
    ENTITY('entity'):
        ENTITY("label") node:
    """
    with pytest.raises(SchemaConfigException) as excinfo:
        SchemaConfigParser().parse(input_string)
    assert excinfo.value.args[0].startswith("Couldn't resolve token ")


def test_typing_of_static_values():
    """Static values keep str/int/float/bool types (reference test :242-254)."""
    tree = parse_schema(
        """
        ENTITY("t"):
            NODE("L") n:
                - s = "text"
                - i = 42
                - f = 1.5
                - b = True
                - b2 = False
        """
    )
    attrs = tree[0][1][0][0][1][0]
    values = [a[1][2] for a in attrs]
    assert values == ["text", 42, 1.5, True, False]
    assert [type(v) for v in values] == [str, int, float, bool, bool]


def test_dynamic_keys():
    """Dynamic label from a row column (reference dynamic_keys.yaml)."""
    tree = parse_schema(
        """
        ENTITY("entity"):
            NODE(entity.dynamic_label) node:
                + id = entity.id
        """
    )
    node = tree[0][1][0][0]
    assert node[1][1] == [["AttributeFactory", [None, "dynamic_label", None]]]
    assert node[1][2] == "id"


def test_relation_keyword_deprecation_message():
    """Reference core/converter.py:307-308 — the deprecated RELATION(
    keyword gets its dedicated migration message, not a generic parse
    error."""
    import pytest
    from data2neo_spark.schema.compiler import compile_schema

    with pytest.raises(DeprecationWarning,
                       match="The RELATION keyword is deprecated. "
                             "Please use RELATIONSHIP instead."):
        compile_schema('ENTITY("E"):\n  NODE("X") x:\n    + id = E.id\n'
                       '  RELATION(x, "r", x):\n')


def test_version_matches_pyproject():
    import pathlib
    import re

    import data2neo_spark

    toml = (pathlib.Path(data2neo_spark.__file__).parent.parent
            / "pyproject.toml").read_text()
    assert re.search(r'version = "([^"]+)"', toml).group(1) == \
        data2neo_spark.__version__
