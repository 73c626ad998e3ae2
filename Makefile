# drl-tetris-tpu build & test targets (the reference's Makefile analog).
.PHONY: all kv oracle test test-quick bench clean up

# Topology launcher: tetrikv + 1 trainer + N workers as local processes
# (the docker-compose analog: trainer x1 + worker x3 + redis,
# docker-compose.yaml:4-35).  `make up N=3 STEPS=200000 UPDATES=20`
N ?= 3
STEPS ?= 0
UPDATES ?= 0
up: kv
	python -m drl_tetris_tpu up --workers $(N) --steps $(STEPS) --updates $(UPDATES)

all: kv

kv:
	native/kvstore/build.sh

oracle:
	oracle/build.sh

test:
	python -m pytest tests/ -x -q

# fast subset: skips the oracle-lockstep / heavy-compile modules (~20 min
# saved on this 2-CPU box); run `make test` before shipping engine changes.
# -n 2 --dist loadfile: two xdist workers (the suite cost is per-process
# Python tracing/lowering of the jitted programs, which parallelizes;
# loadfile keeps each module's fixed-port KV servers on one worker)
test-quick:
	python -m pytest tests/ -x -q -m 'not slow' -n 2 --dist loadfile

bench:
	python bench.py

clean:
	rm -rf build /tmp/drl_tetris_oracle
