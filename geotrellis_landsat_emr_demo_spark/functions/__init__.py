"""Scalar/raster function registry (the reference's op-by-name dispatch)."""
