"""Shared utilities: dtype policy, checkpointing, logging, trees."""
