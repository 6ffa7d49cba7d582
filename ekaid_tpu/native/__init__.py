"""Native (C++) host-side accelerators, loaded via ctypes.

Build with `make -C ekaid_tpu/native` (or `python -m
ekaid_tpu.native.build`); every entry point has a numpy fallback so the
framework runs without the compiled library.
"""

from ekaid_tpu.native.bindings import (  # noqa: F401
    available, spatial_adjacency_batch, match_disease, exact_match)
