"""ctypes bindings to the native host core (native/qmha_core.cpp).

pybind11 is not in this image, so the C++ core exports a plain C ABI and
this module wraps it with ctypes. The library is built on demand with g++
(`make native` produces the same artifact); everything degrades gracefully:
`available()` is False when no compiler/library is present and callers
(tests) skip.
"""

from quantizedmha_tpu.native.lib import (
    NativeCore,
    available,
    cpu_mha,
    load,
    quantize_int8,
    verify,
)

__all__ = ["NativeCore", "available", "cpu_mha", "load", "quantize_int8", "verify"]
