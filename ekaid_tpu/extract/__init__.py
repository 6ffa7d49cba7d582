"""Feature-extraction pipeline: images → per-class nodes → graph files."""
