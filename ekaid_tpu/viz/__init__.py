"""Qualitative visualization (model/visualizations/draw_*.py parity)."""
