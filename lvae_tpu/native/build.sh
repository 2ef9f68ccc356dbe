#!/bin/sh
# Build the native IO library. Requires g++ (baked into the image).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o liblvae_io.so csv_reader.cc
echo "built $(pwd)/liblvae_io.so"
