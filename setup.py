"""Build script for the native extension (sdpb_tpu._fastio).

GMP is linked by its soname (the image ships libgmp.so.10 without the
-dev symlink); the extension is optional — sdpb_tpu falls back to the
mpmath path when the import fails.
"""
import os

from setuptools import Extension, setup

ext_modules = []
if os.environ.get("SDPB_TPU_NO_NATIVE") != "1":
    ext_modules.append(Extension(
        "sdpb_tpu._fastio",
        sources=["native/fastio.cpp"],
        extra_compile_args=["-O2", "-std=c++17"],
        extra_link_args=["-l:libgmp.so.10"],
        optional=True,
    ))

setup(ext_modules=ext_modules)
