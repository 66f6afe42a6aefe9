#!/bin/sh
# Build the native runtime components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -shared -fPIC vocab_loader.cpp -o lib/libvocab_loader.so
echo "built native/lib/libvocab_loader.so"
