"""File metadata: storage + format auto-detection from path.

Reference parity: src/bears/FileMetadata.py:24-147 (path + storage + format +
MLType schema, detection from extension) and the FileFormat enum
(src/bears/constants/_FileConstants.py:8-47).

Spark note: storage backends collapse into Hadoop FS URIs — s3a://, file://,
hdfs:// are all the same ``spark.read`` call; only detection logic lives here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from enum import Enum

from bears_spark.types import MLTypeSchema


class FileFormat(str, Enum):
    CSV = "csv"
    TSV = "tsv"
    PARQUET = "parquet"
    JSONLINES = "jsonlines"
    JSON = "json"
    NPZ = "npz"
    PICKLE = "pickle"
    YAML = "yaml"
    TEXT = "text"
    BINARY = "binary"
    ORC = "orc"
    AVRO = "avro"
    ARROW = "arrow"
    XML = "xml"
    FIXED_WIDTH = "fixed_width"


_EXT_TO_FORMAT = {
    ".csv": FileFormat.CSV,
    ".tsv": FileFormat.TSV,
    ".tab": FileFormat.TSV,
    ".parquet": FileFormat.PARQUET,
    ".pq": FileFormat.PARQUET,
    ".jsonl": FileFormat.JSONLINES,
    ".jsonlines": FileFormat.JSONLINES,
    ".ndjson": FileFormat.JSONLINES,
    ".json": FileFormat.JSON,
    ".npz": FileFormat.NPZ,
    ".arrow": FileFormat.ARROW,
    ".xml": FileFormat.XML,
    ".feather": FileFormat.ARROW,
    ".ipc": FileFormat.ARROW,
    ".pkl": FileFormat.PICKLE,
    ".pickle": FileFormat.PICKLE,
    ".yaml": FileFormat.YAML,
    ".yml": FileFormat.YAML,
    ".txt": FileFormat.TEXT,
    ".orc": FileFormat.ORC,
    ".avro": FileFormat.AVRO,
}


class Storage(str, Enum):
    LOCAL = "local"
    S3 = "s3"
    HDFS = "hdfs"
    URL = "url"
    STREAM = "stream"


def detect_storage(path: str) -> Storage:
    if path.startswith(("s3://", "s3a://", "s3n://")):
        return Storage.S3
    if path.startswith("hdfs://"):
        return Storage.HDFS
    if path.startswith(("http://", "https://")):
        return Storage.URL
    return Storage.LOCAL


def detect_format(path: str) -> FileFormat | None:
    base = path.rstrip("/")
    # tolerate compression suffixes: data.csv.gz
    for _ in range(2):
        root, ext = os.path.splitext(base)
        if ext.lower() in _EXT_TO_FORMAT:
            return _EXT_TO_FORMAT[ext.lower()]
        base = root
    return None


def to_spark_path(path: str) -> str:
    """Normalize URIs for Hadoop FS (s3:// -> s3a://)."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


@dataclass
class FileMetadata:
    path: str
    format: FileFormat | None = None
    storage: Storage | None = None
    data_schema: MLTypeSchema | None = None
    params: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.storage is None:
            self.storage = detect_storage(self.path)
        if self.format is None:
            self.format = detect_format(self.path)

    @property
    def spark_path(self) -> str:
        return to_spark_path(self.path)
