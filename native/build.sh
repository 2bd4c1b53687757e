#!/bin/sh
# Build the native host-side audio runtime.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libhmdt_native.so hmdt_native.cpp
echo "built $(pwd)/libhmdt_native.so"
