#!/bin/bash
# Build the native tools (replaces the reference's per-variant build.sh that
# compiled 30 copies of evaluate_object.cpp; one parameterized binary here).
set -e
cd "$(dirname "$0")"
g++ -O3 -Wall -std=c++17 -o kitti_eval kitti_eval.cpp
echo "built cpp/kitti_eval"
