"""Sources: edge-list readers, deterministic graph generators, page→edge extraction."""
