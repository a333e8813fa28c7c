"""Per-host compile-cache keying (the BENCH_r04 poisoned-cache fix).

XLA:CPU AOT entries embed the compiling machine's target features; loading
them on a different host emits cpu_aot_loader mismatch errors and forfeits
the cache. utils/cache.py therefore scopes the cache dir by a host
fingerprint — these tests pin that contract so a refactor can't silently
return to a shared flat dir.
"""

import os
import re

import jax

from causal_gen_tpu.utils.cache import host_fingerprint, setup_compilation_cache


class TestCacheFingerprint:
    def test_fingerprint_stable_and_hexish(self):
        a, b = host_fingerprint(), host_fingerprint()
        assert a == b
        assert re.fullmatch(r"[0-9a-f]{12}", a)

    def test_cache_dir_is_host_scoped(self, tmp_path):
        d = setup_compilation_cache(str(tmp_path))
        try:
            # the configured dir must be a fingerprint SUBDIR of the base —
            # never the shared base itself (that was the poisoned layout)
            assert os.path.dirname(d) == str(tmp_path)
            assert os.path.basename(d) == host_fingerprint()
            assert jax.config.jax_compilation_cache_dir == d
        finally:
            # restore the default so later tests in the process are unaffected
            setup_compilation_cache()
