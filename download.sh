#!/bin/bash
# Fetch the five released ONNX weight files (same artifacts the reference
# consumes; imported into Flax by models/onnx_import.py).

set -e
mkdir -p weights
rm -f weights/*.onnx

BASE=https://github.com/yakhyo/face-reidentification/releases/download/v0.0.1
for f in det_2.5g det_500m det_10g w600k_mbf w600k_r50; do
  wget -O "weights/${f}.onnx" "${BASE}/${f}.onnx"
done
