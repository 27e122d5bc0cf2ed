"""Sources: MBTiles (SQLite), MVT file trees, gzip wrappers."""
