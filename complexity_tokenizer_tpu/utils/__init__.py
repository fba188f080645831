from . import bytelevel, unicode_tables

__all__ = ["bytelevel", "unicode_tables"]
