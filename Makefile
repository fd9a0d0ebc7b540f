# Build system (reference Makefile:1-66 reborn).
#
# The reference built one CUDA binary per kernel (`make KERNEL=fa`); here the
# TPU kernels are JIT-compiled Pallas programs, so `make` only builds the
# native host components: the core library (golden MHA / verifier / INT8
# quantizer, consumed from Python via ctypes) and the golden-case generator.

CXX      ?= g++
CXXFLAGS ?= -O3 -std=c++17 -Wall -Wextra -fPIC -pthread
BUILD    := native/build
BIN      := bin

.PHONY: all native golden test bench clean

all: native

native: $(BUILD)/libqmha_core.so $(BIN)/golden_gen

$(BUILD)/libqmha_core.so: native/qmha_core.cpp native/qmha_core.h
	@mkdir -p $(BUILD)
	$(CXX) $(CXXFLAGS) -shared -o $@ native/qmha_core.cpp

$(BIN)/golden_gen: native/golden_gen.cpp native/qmha_core.cpp native/qmha_core.h
	@mkdir -p $(BIN)
	$(CXX) $(CXXFLAGS) -o $@ native/golden_gen.cpp native/qmha_core.cpp

# Generate the golden test corpus (consumed by tests/test_golden_cases.py).
golden: $(BIN)/golden_gen
	$(BIN)/golden_gen tests/golden

test:
	python -m pytest tests/ -x -q

# Mosaic-compile one tiny case per Pallas kernel family on the REAL TPU
# (no interpret mode) and gate on numerics — the TPU analog of the
# reference's standalone device unit binary (tests/test_fa_tc.cu:17-43).
chip-unit:
	python scripts/chip_unit.py

bench:
	python bench.py

clean:
	rm -rf $(BUILD) $(BIN)
