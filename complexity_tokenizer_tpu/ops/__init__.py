from . import hashtable, presplit, tables

__all__ = ["hashtable", "presplit", "tables"]
