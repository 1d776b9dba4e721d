#!/usr/bin/env bash
# One-command round gate — the full local correctness protocol:
#   1. unit specs (incl. PartitionInvarianceSpec's 12-family
#      bit-identical check at two awkward execution configs)
#   2. sf0.01 oracle pack: Verify dump + DuckDB compare (the driver's
#      own gate; full pack — 199 queries as of r18)
#   3. the same pack at 7 cores / 7 shuffle partitions — the full-pack
#      partitioning-invariance proof (awkward prime vs the usual 32)
# Green = "N pass, 0 fail" twice (N = full pack, 199 as of r18) and a
# green sbt test. Timing is NOT
# checked here — bench runs need a quiet box and the min-of-N protocol
# (SCALING.md "Benchmark protocol").
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"

sbt -batch test

sbt -batch "runMain graft.Verify $SF_DIR /tmp/roundcheck_out"
python3 tools/check.py "$SF_DIR" /tmp/roundcheck_out

SPARK_GRAFT_CPUS=7 sbt -batch "runMain graft.Verify $SF_DIR /tmp/roundcheck_p7"
python3 tools/check.py "$SF_DIR" /tmp/roundcheck_p7

echo "roundcheck: all three gates green ($SF_DIR)"
