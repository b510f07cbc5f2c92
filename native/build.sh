#!/bin/sh
# Build the native host-pipeline library. Run from anywhere.
set -e
cd "$(dirname "$0")"
# -mtune=generic (no -march=native): the built .so is committed and must not
# SIGILL on machines without this host's ISA extensions; the kernel is
# memcpy-bound so vector width past baseline buys nothing.
g++ -O3 -mtune=generic -shared -fPIC -std=c++17 \
    -o libpatch_sampler.so patch_sampler.cpp -lpthread
echo "built $(pwd)/libpatch_sampler.so"
