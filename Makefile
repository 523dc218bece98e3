# Developer entry points.
#
# `make test` runs the suite on a virtual 8-device CPU mesh (conftest.py
# forces JAX_PLATFORMS=cpu). PALLAS_AXON_POOL_IPS is cleared so the
# container's axon TPU tunnel handshake (~80s/process) is skipped for
# CPU-only runs; bench/TPU runs keep the environment intact.

PYTEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test bench tools tools-asan

test:
	$(PYTEST_ENV) python -m pytest tests/ -x -q

bench:
	python bench.py

tools:
	cmake -S cpp -B cpp/build -G Ninja -DCMAKE_BUILD_TYPE=Release && cmake --build cpp/build

# ASan+UBSan instrumented eval tools (separate build dir so `tools`
# stays pristine); run the eval-tool test suite against them with
# SFM_EVAL_SANITIZE=1 make test-eval-asan
tools-asan:
	cmake -S cpp -B cpp/build-asan -G Ninja -DCMAKE_BUILD_TYPE=RelWithDebInfo -DSFM_EVAL_SANITIZE=ON && cmake --build cpp/build-asan

test-eval-asan: tools-asan
	$(PYTEST_ENV) SFM_EVAL_SANITIZE=1 python -m pytest tests/test_eval_tools.py -x -q
