"""C++ native host kernels with ctypes bindings.

Build once with ``python -m rten_tpu.native.build`` (g++, no external deps).
Every caller has a pure-Python fallback — ``available()`` gates dispatch, and
parity between the two implementations is tested (tests/test_native.py).
"""

from rten_tpu.native.bindings import (
    available,
    bpe_apply_native,
    ctc_beam_search_native,
    find_contours_native,
    load_library,
)

__all__ = [
    "available",
    "load_library",
    "bpe_apply_native",
    "ctc_beam_search_native",
    "find_contours_native",
]
