"""Placeholder — populated with the zarr demo query in a later milestone."""
