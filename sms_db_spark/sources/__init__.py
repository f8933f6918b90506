"""Importer normalizers: XML / Bugle / Signal → canonical (messages, parts)."""
