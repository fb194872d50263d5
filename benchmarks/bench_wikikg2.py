"""Standalone runner for the wikikg2-scale config (see bench.py, which the
driver invokes and which chains both headline configs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import bench

    bench.run_one("wikikg2")


if __name__ == "__main__":
    sys.exit(main())
