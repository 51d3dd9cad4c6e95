"""Subpackage: runtime."""
