"""Build config: the fpv_native C extension (brotli bridge + scan kernels).

The extension links the system libbrotli runtime libraries directly (the
image ships no -dev package; see native/brotli_shim for the API
declarations).  Build failures are non-fatal: the package falls back to a
ctypes brotli bridge and numpy kernels.
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover
            print(f"warning: building fpv_native failed ({e}); "
                  "falling back to ctypes bridge")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f"warning: building {ext.name} failed ({e})")


def make_ext():
    from setuptools import Extension

    return Extension(
        "fpv_native",
        sources=["native/fpv_native.cc"],
        include_dirs=["native/brotli_shim"],
        extra_compile_args=["-O3", "-std=c++14"],
        extra_link_args=[
            "-l:libbrotlienc.so.1",
            "-l:libbrotlidec.so.1",
            "-l:libbrotlicommon.so.1",
        ],
    )


setup(ext_modules=[make_ext()], cmdclass={"build_ext": OptionalBuildExt})
