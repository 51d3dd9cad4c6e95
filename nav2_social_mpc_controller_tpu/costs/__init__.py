"""Subpackage: costs."""
