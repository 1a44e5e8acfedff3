"""Multimodal binary-column plumbing (north-star extension)."""
