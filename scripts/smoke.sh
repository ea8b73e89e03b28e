#!/usr/bin/env bash
# Round-end green gate (VERDICT r4 item 3): a <5 min smoke subset that
# covers the subsystems most likely to be broken by in-flight work —
# streaming (both engines + CLI), the fused batch pipeline parity locks,
# and the randomized cross-engine differential CI corpus. Run this before
# ANY end-of-round snapshot (~8 min); never flip a default to a code path without a
# test executing it.
#
# Full suite (~8 min):  python -m pytest tests/ -q -n 4
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/test_stream.py tests/test_fused_parity.py \
    tests/test_differential_fuzz.py -q "$@"
