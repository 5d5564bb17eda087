#!/bin/sh
# Build the native host data-plane library.
set -e
cd "$(dirname "$0")"
CXX="${CXX:-g++}"
OUT="${1:-libpipshost.so}"
$CXX -O3 -fPIC -shared -fopenmp -std=c++17 pips_host.cpp -o "$OUT"
echo "built $OUT"
