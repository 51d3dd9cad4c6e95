"""Parity oracle package: independent NumPy reimplementation of the
reference controller semantics for golden cross-checks (SURVEY.md section 4b)."""
