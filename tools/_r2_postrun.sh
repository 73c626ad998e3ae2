#!/bin/bash
# Round-2 post-training sequence: wait for the demo10m run (pid $1), then
# build the learning artifact (vs the round-1 demo checkpoint) and run the
# benchmark.  Logs to /tmp/postrun.log.
set -x
while kill -0 "$1" 2>/dev/null; do sleep 10; done
cd /root/repo
python tools/make_learning_artifact.py data/models/demo10m \
    --vs data/demo_weights --games 64 --out LEARNING_r02.json
python bench.py > /tmp/bench_r2.json 2>/tmp/bench_r2.err
echo POSTRUN_DONE
