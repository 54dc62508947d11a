"""Relational + extension operators."""
