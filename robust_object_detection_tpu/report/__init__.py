"""Reporting: figures, comparison tables, and demo strips (reference L7)."""
