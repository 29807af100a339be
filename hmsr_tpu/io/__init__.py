"""Burst I/O: DNG ingest (optional rawpy/exifread), array bursts, synthetic
burst generation, and DNG/TIFF output (optional exiftool/dng_validate)."""
