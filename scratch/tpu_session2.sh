#!/bin/bash
set -x
rm -rf /tmp/enc_trace
timeout 1800 python scratch/trace_encode.py
timeout 120 python scratch/parse_trace.py /tmp/enc_trace 2 2>/dev/null | head -60
timeout 3300 python bench.py
