#!/bin/sh
# Build the native components into shared libraries loadable via ctypes.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o _lap.so lap.cpp
echo "built native/_lap.so"
