#!/usr/bin/env bash
# Data-parallel evaluation launcher (the reference dist_test.sh role,
# reference dist_test.sh:1-22). On TPU a single process drives all local
# chips through the mesh; across hosts/processes this script shards the
# DATASET and merges the psum-able confusion states via results aggregation.
#
#   WORKERS=4 ./dist_eval.sh configs/cfg_potsdam.py [extra eval.py args...]

CONFIG=${1:?usage: dist_eval.sh <config> [args...]}
shift
WORKERS=${WORKERS:-4}
WORK_DIR=${WORK_DIR:-work_dirs/dist}

pids=()
for ((r = 0; r < WORKERS; r++)); do
  python eval.py --config "$CONFIG" --work-dir "$WORK_DIR/rank$r" \
    --shard "$r/$WORKERS" "$@" &
  pids+=($!)
done

status=0
for pid in "${pids[@]}"; do
  wait "$pid" || status=1
done

# fold the per-rank [4, C] confusion states into the single dataset-level
# result (the reference's mmengine distributed metric collection role)
if [ "$status" -eq 0 ]; then
  python eval.py --merge "$WORK_DIR" || status=1
fi
exit $status
