"""Scalar expression + hashing helpers shared by importers and queries."""
