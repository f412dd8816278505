#!/bin/sh
# Build the native host-chemistry worker (libchemhost.so).
# Used by ml_conformer_generator_tpu/chem/native.py, which also invokes this
# automatically on first import if the library is missing.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libchemhost.so chemhost.cpp -lpthread
echo "built $(pwd)/libchemhost.so"
