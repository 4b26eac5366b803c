# Convenience targets (reference repo ships a Makefile too).

.PHONY: test test-fast bench native clean-native e2e dryrun parity

# Real-data parity vs the reference's published AP 0.943 / AR 0.954:
#   DATA_DIR=/path/to/crowdai CHECKPOINT=/path/to/best.torch make parity
parity:
	python -m mapping_tpu.main parity_drill

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_e2e.py --ignore=tests/test_scoring_e2e.py

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -std=c++17 cpp/rle.cpp -o cpp/librle.so
	g++ -O3 -shared -fPIC -std=c++17 cpp/gbm.cpp -o cpp/libgbm.so

clean-native:
	rm -f cpp/librle.so cpp/libgbm.so

e2e:
	python -m pytest tests/test_e2e.py tests/test_scoring_e2e.py -q

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
