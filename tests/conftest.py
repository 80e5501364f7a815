"""Test config: force the local CPU backend with 8 virtual devices.

The container's sitecustomize registers the remote `axon` TPU backend and
forces it via jax.config, with ~1s per-op tunnel latency — unusable for
tests. Tests run on host CPU with an 8-device virtual mesh so the
distributed four-step path (all-to-all) is exercised without TPUs
(SURVEY.md §4 item 8).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles ~40 fully-unrolled limb
# graphs (~10s each on CPU); caching makes re-runs take seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NTT_TEST_CACHE_DIR", os.path.join(
                      os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Force zlib cache compression: the bundled zstandard C backend segfaulted
# the interpreter inside put/get_executable_and_time twice in round 5
# (killing the whole suite at ~90%); zlib is pure-stdlib and immune.
from jax._src import compilation_cache as _cc  # noqa: E402

_cc.zstd = None
_cc.zstandard = None
