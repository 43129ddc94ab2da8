from bears_spark.io.metadata import FileFormat, Storage, FileMetadata
from bears_spark.io.reader import read, Reader
from bears_spark.io.writer import write, Writer

__all__ = ["FileFormat", "Storage", "FileMetadata", "read", "Reader", "write", "Writer"]
