"""Native host runtime: C++ audio decode + ctypes bindings."""
