from . import chat, config, parsing, serialization

__all__ = ["chat", "config", "parsing", "serialization"]
