#!/bin/bash
# End-of-round gate: every snapshot commit must be preceded by a green run
# of this script (compile + full test suite + oracle verify at sf0.01).
# Round 5 shipped a compile error and lost its whole gate cycle — this
# makes the pre-commit check mechanical instead of remembered.
set -eo pipefail
cd /root/repo
echo "[gate] sbt compile" && sbt -batch compile
echo "[gate] sbt test" && sbt -batch test
echo "[gate] oracle verify (sf0.01)" && scripts/run_verify.sh /root/testdata/sf0.01
echo "[gate] GREEN"
