"""Training/eval drivers and the pjit train step."""
