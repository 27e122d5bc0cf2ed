"""Spatial core: web-mercator ZXY tiling, SFC/hex cell indexes, PIP, kNN."""
