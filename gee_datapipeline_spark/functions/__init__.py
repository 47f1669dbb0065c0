"""Column-level function families: stable numerics, geo, text, dedup,
similarity, multimodal. Everything here returns Column expressions or
pandas_udfs — no actions, no driver-side loops."""
