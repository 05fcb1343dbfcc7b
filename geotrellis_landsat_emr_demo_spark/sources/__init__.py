"""Distributed scene sources (beyond the catalog's images table)."""
