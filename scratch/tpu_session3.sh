#!/bin/bash
# Round-3 session-3 TPU batch: validate the new defaults (block window kernel
# + matmul patch embed) with a fresh trace, then capture the headline bench.
set -x
rm -rf /tmp/enc_trace
timeout 1800 python scratch/trace_encode.py
timeout 120 python scratch/parse_trace.py /tmp/enc_trace 2 2>/dev/null | head -40
timeout 3300 python bench.py
