"""Native (C++) host-runtime components, loaded via ctypes.

Compiled lazily on first use (g++ -O3 -shared); every entry point has a
NumPy fallback so the framework works without a toolchain.
"""

from gnnra_tpu.native.build import get_lib, native_available  # noqa: F401
