"""Subpackage: world."""
