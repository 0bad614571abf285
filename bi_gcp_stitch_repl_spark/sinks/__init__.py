from .merge import ParquetTable, WatermarkStore

__all__ = ["ParquetTable", "WatermarkStore"]
