#!/bin/sh
# Build the native helpers next to this script.
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libtrackbuilder.so trackbuilder.cpp
echo "built $(pwd)/libtrackbuilder.so"
g++ -O3 -shared -fPIC -std=c++17 -o libimageloader.so imageloader.cpp -ljpeg -lpng
echo "built $(pwd)/libimageloader.so"
