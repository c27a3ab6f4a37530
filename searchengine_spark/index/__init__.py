from .pipeline import IndexTables, assign_docids, build_tables

__all__ = ["IndexTables", "assign_docids", "build_tables"]
