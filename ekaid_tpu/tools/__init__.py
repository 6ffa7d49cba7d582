"""Interop tooling: torch checkpoint conversion, pipeline orchestration."""
