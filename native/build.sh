#!/bin/sh
# Build the native host-side audio kernels.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libfrtts_audio.so audio_kernels.cpp
echo "built: $(pwd)/libfrtts_audio.so"
