"""Subpackage: solver."""
