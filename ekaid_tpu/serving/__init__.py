"""Inference serving: HTTP server + terminal client (demo parity)."""
