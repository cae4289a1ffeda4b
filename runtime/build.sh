#!/bin/sh
# Build the native runtime library (prefetching TUM loader).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    tum_loader.cc -o libtumloader.so -lpng -lz -lpthread
echo "built runtime/libtumloader.so"
