"""Composed end-to-end jobs built from the operator library."""
