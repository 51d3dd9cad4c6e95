"""Subpackage: controller."""
