#!/bin/sh
# Build the native audio IO library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    audio_io.cpp -o libfangyan_audio.so
echo "built $(pwd)/libfangyan_audio.so"
