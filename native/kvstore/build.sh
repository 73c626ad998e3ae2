#!/bin/bash
# Build the tetrikv control-plane server.
set -euo pipefail
OUT=${OUT:-$(dirname "$0")/../../build}
mkdir -p "$OUT"
g++ -O2 -std=c++17 -o "$OUT/tetrikv" "$(dirname "$0")/kvstore.cpp"
echo "$OUT/tetrikv"
