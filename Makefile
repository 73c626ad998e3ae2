# drl-tetris-tpu build & test targets (the reference's Makefile analog).
.PHONY: all kv oracle test bench clean

all: kv

kv:
	native/kvstore/build.sh

oracle:
	oracle/build.sh

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf build /tmp/drl_tetris_oracle
