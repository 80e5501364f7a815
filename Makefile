# Build targets for the native components (the reference's 16-line nvcc
# Makefile analog, /root/reference/Makefile:1-16 — here the native target is
# the host field library instead of CUDA programs).

CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC -Wall

all: hostlib

hostlib: ntt_tpu/hostlib/libhostfield.so

ntt_tpu/hostlib/libhostfield.so: csrc/hostfield.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

test: hostlib
	python3 -m pytest tests/ -x -q

bench:
	python3 bench.py

clean:
	rm -f ntt_tpu/hostlib/libhostfield.so

.PHONY: all hostlib test bench clean
