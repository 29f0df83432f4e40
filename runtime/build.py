#!/usr/bin/env python
"""Build the native data runtime: g++ -O3 shared library next to this file."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "eedata.cpp")
OUT = os.path.join(HERE, "libeedata.so")


def _have_libjpeg() -> bool:
    probe = os.path.join(HERE, ".jpeg_probe.cpp")
    with open(probe, "w") as f:
        # jpeglib.h relies on size_t/FILE being declared by the includer
        f.write("#include <cstddef>\n#include <cstdio>\n"
                "#include <jpeglib.h>\n"
                "int main(){return JPEG_LIB_VERSION>0?0:1;}\n")
    try:
        r = subprocess.run(["g++", "-std=c++17", probe, "-ljpeg",
                            "-o", os.devnull], capture_output=True)
        return r.returncode == 0
    finally:
        os.unlink(probe)


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
           "-march=native", SRC, "-o", OUT]
    if _have_libjpeg():
        cmd.insert(1, "-DEE_HAVE_JPEG")
        cmd.append("-ljpeg")
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except subprocess.CalledProcessError:
        # -march=native can fail in emulated environments; retry portable
        cmd.remove("-march=native")
        subprocess.run(cmd, check=True, capture_output=not verbose)
    if verbose:
        print("built", OUT)
    return OUT


if __name__ == "__main__":
    build()
