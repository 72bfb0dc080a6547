#!/usr/bin/env bash
# Pre-snapshot gate: never commit a round without a compiling tree.
# Round 3 shipped a non-compiling snapshot (see VERDICT round 3) — this
# script is the ritual that prevents a repeat. Run before every commit
# that closes a milestone; run `sbt -batch test` too when time allows.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "Test/compile"
echo "preflight OK: main + test sources compile"
