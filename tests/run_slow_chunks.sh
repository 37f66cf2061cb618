#!/usr/bin/env bash
# Chunked slow-tier runner (VERDICT r4 item 7).
#
# The slow tier (32 e2e/recipe/distributed/subprocess tests) exceeds 60 min
# on this 1-core host; one monolithic `timeout 3000 pytest -m slow` dies with
# ZERO output because `| tail` buffers everything (two round-4 runs were lost
# this way).  This script encodes the per-file chunked invocation CLAUDE.md
# describes in prose: each file runs under its own timeout, output streams
# unbuffered per chunk, and a summary table prints at the end.
#
# Usage:
#   bash tests/run_slow_chunks.sh            # full slow tier
#   bash tests/run_slow_chunks.sh test_dp_production test_watchdog   # subset
#
# Rules (CLAUDE.md):
#   - NEVER run concurrently with TPU bench runs (1-core contention blows
#     both up).
#   - The conftest force-pins JAX_PLATFORMS=cpu + an 8-device virtual mesh;
#     nothing here touches the TPU.
set -u
cd "$(dirname "$0")/.."

# file -> per-file timeout (s).  Production-geometry DP / multihost / recipe
# files carry heavy XLA:CPU compiles on this host (round-4 measurements);
# everything else fits comfortably in the default.
declare -A TIMEOUTS=(
  [test_caffemodel_cli]=900
  [test_checkpoint_topology]=1800
  [test_coco_cli]=900
  [test_distributed]=900
  [test_dp_equivalence]=1800
  [test_dp_production]=2700
  [test_graft_entry]=2700
  [test_learning]=900
  [test_loader_and_validation]=900
  [test_run_recipe]=2400
  [test_serving]=900
  [test_show_result]=600
  [test_tools_e2e]=1800
  [test_torch_grad_crosscheck]=900
  [test_train_multihost]=1800
  [test_train_step]=900
  [test_watchdog]=1200
)
# run heavy chunks first so a budget overrun hits the cheap tail, not the
# production-geometry coverage
ORDER=(
  test_dp_production test_graft_entry test_run_recipe test_train_multihost
  test_dp_equivalence test_checkpoint_topology test_tools_e2e test_watchdog
  test_caffemodel_cli test_coco_cli test_distributed test_learning
  test_loader_and_validation test_serving test_show_result
  test_torch_grad_crosscheck test_train_step
)

if [ "$#" -gt 0 ]; then
  ORDER=("$@")
fi

declare -a RESULTS=()
FAILED=0
T_ALL0=$(date +%s)
for name in "${ORDER[@]}"; do
  name="${name%.py}"; name="${name#tests/}"
  f="tests/${name}.py"
  t="${TIMEOUTS[$name]:-900}"
  echo "=== ${f} (timeout ${t}s) — started $(date -u +%H:%M:%S) ==="
  t0=$(date +%s)
  # stdbuf: stream line-by-line so there is never a silent multi-minute gap
  timeout "$t" stdbuf -oL -eL python -m pytest "$f" -m slow -q --no-header
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  if [ "$rc" -eq 0 ]; then
    status="ok"
  elif [ "$rc" -eq 5 ]; then
    status="no-slow-tests"   # pytest exit 5: nothing collected
  elif [ "$rc" -eq 124 ]; then
    status="TIMEOUT"; FAILED=1
  else
    status="FAIL(rc=$rc)"; FAILED=1
  fi
  RESULTS+=("$(printf '%-28s %5ss  %s' "$name" "$dt" "$status")")
  echo "--- ${name}: ${status} in ${dt}s"
done

echo
echo "=== slow tier summary ($(( $(date +%s) - T_ALL0 ))s total) ==="
printf '%s\n' "${RESULTS[@]}"
exit "$FAILED"
