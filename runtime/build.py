#!/usr/bin/env python
"""Build the native data runtime: g++ -O3 shared library next to this file."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "eedata.cpp")
OUT = os.path.join(HERE, "libeedata.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
           "-march=native", SRC, "-o", OUT]
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
