"""Small utilities (reference data2neo/utils.py parity)."""


def load_file(file_path: str) -> str:
    """Load a schema file's contents (reference utils.py:11-16)."""
    with open(file_path, "r", encoding="utf-8") as fstream:
        return fstream.read()
