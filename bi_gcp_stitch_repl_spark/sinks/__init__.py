from .merge import ParquetTable, WatermarkStore
from .versioned import CommitConflict, VersionedTable

__all__ = ["CommitConflict", "ParquetTable", "VersionedTable", "WatermarkStore"]
