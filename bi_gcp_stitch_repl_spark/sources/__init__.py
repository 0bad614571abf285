from .warehouse import Warehouse, load_tables

__all__ = ["Warehouse", "load_tables"]
