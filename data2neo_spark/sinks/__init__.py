from .neo4j_export import cypher_statements, write_admin_import_csvs, encode_key

__all__ = ["cypher_statements", "write_admin_import_csvs", "encode_key"]
