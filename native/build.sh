#!/bin/sh
# Build liblvtdata.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o liblvtdata.so lvt_data.cpp -lpng -lz -pthread
echo "built $(pwd)/liblvtdata.so"
