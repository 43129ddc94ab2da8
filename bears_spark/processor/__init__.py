from bears_spark.processor.base import (
    DataProcessor,
    SingleColumnProcessor,
    Nto1ColumnProcessor,
    MissingColumnBehavior,
    get_processor,
)
from bears_spark.processor import text, categorical, numeric, vector, encoders  # noqa: F401 — register

__all__ = [
    "DataProcessor",
    "SingleColumnProcessor",
    "Nto1ColumnProcessor",
    "MissingColumnBehavior",
    "get_processor",
]
