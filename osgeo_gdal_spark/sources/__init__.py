"""Deterministic table synthesis: pages, polygon layer, raster tiles."""
