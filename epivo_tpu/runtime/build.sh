#!/bin/sh
# Build the native runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -Wall loader.cpp lm_ref.cpp -o libepivo_runtime.so -lpng -lpthread
echo "built $(pwd)/libepivo_runtime.so"
