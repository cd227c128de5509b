"""Native (C++) runtime components, loaded via ctypes when built.

Build with ``make -C native`` from the repo root; everything here degrades
gracefully to pure-Python fallbacks when the shared library is absent.
"""
