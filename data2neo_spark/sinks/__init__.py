from .neo4j_export import cypher_statements, write_admin_import_csvs, encode_key
from .neo4j_live import edge_batches, node_batches, push_store

__all__ = [
    "cypher_statements",
    "write_admin_import_csvs",
    "encode_key",
    "node_batches",
    "edge_batches",
    "push_store",
]
