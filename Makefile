# Dev task launcher (analog of the reference's `dev` script + Makefile).

CXX ?= g++
NATIVE_SRC = csrc/bess_host.cpp
NATIVE_LIB = besskge_tpu/_native_build/libbess_host.so

.PHONY: all native test test-fast bench doc lint install clean ci

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	mkdir -p besskge_tpu/_native_build
	$(CXX) -O3 -march=native -shared -fPIC $(NATIVE_SRC) -o $(NATIVE_LIB)

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -k "not bess and not topk and not pipeline"

bench: native
	python bench.py

doc:
	JAX_PLATFORMS=cpu python docs/gen_api.py

# Skip gracefully when the linters aren't installed (some sandboxes ship
# without dev tools and forbid pip installs); CI environments with
# requirements-dev.txt installed run both for real.
lint:
	@if command -v ruff >/dev/null 2>&1; then \
		ruff check besskge_tpu tests examples bench.py __graft_entry__.py; \
	else echo "lint: ruff not installed, skipping"; fi
	@if command -v mypy >/dev/null 2>&1; then \
		mypy besskge_tpu; \
	else echo "lint: mypy not installed, skipping"; fi

install:
	pip install -e ".[dev]"

# Render the markdown docs to a static HTML site (docs/html/) — the
# analog of the reference's Sphinx build (its docs/source/conf.py).
docs:
	python docs/build_html.py

# One-command CI aggregate (analog of the reference's `./dev ci`,
# /root/reference/dev:55-160): build native lib, lint, type-check, run the
# full suite on the 8-device virtual CPU mesh.
ci: native lint test docs

clean:
	rm -rf besskge_tpu/_native_build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
