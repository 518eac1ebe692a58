from .iterators import (
    ResourceIterator,
    IteratorIterator,
    PandasDataFrameIterator,
    SparkDataFrameIterator,
    SQLiteIterator,
    ParquetTableIterator,
)

__all__ = [
    "ResourceIterator",
    "IteratorIterator",
    "PandasDataFrameIterator",
    "SparkDataFrameIterator",
    "SQLiteIterator",
    "ParquetTableIterator",
]
