"""Scalar function helpers: deterministic numerics, security, text, vectors."""
