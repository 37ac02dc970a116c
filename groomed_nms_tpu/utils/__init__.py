"""Utilities: torch checkpoint conversion, visualisation, misc helpers."""
