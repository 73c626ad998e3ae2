#!/bin/bash
# Build the parity-test oracle: reference game sources (read-only, compiled
# in place from /root/reference) + our C-ABI wrapper -> liboracle.so.
# The reference tree is never modified and no reference file is copied into
# this repo; the sources are an external test dependency, like a system lib.
set -euo pipefail
REF=${REF:-/root/reference/environment/game_backend/source}
OUT=${OUT:-/tmp/drl_tetris_oracle}
mkdir -p "$OUT"
g++ -O2 -std=c++17 -fPIC -shared \
    -I "$REF" \
    "$(dirname "$0")/wrapper.cpp" \
    "$REF/gamePlay.cpp" "$REF/gameField.cpp" "$REF/pieces.cpp" \
    "$REF/Combo.cpp" "$REF/Garbage.cpp" "$REF/DropDelay.cpp" \
    "$REF/randomizer.cpp" "$REF/TestField.cpp" \
    -o "$OUT/liboracle.so"
echo "$OUT/liboracle.so"
