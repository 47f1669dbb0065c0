"""Sources: GeoJSON ingest, synthetic raster generation, raster stubs."""
