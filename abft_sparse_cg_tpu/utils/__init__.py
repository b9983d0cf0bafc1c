"""Utilities: synthetic matrices, timing helpers."""
