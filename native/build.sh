#!/bin/sh
# Build the native host-pipeline library. Run from anywhere.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o libpatch_sampler.so patch_sampler.cpp -lpthread
echo "built $(pwd)/libpatch_sampler.so"
