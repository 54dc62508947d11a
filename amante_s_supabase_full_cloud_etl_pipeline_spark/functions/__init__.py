"""Scalar column-expression libraries (zero Python UDFs on the hot path)."""
