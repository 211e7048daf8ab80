"""liquid-tpu: a TPU-native vectorized query-execution & caching engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
LiquidCache (reference: XiangpengHao/liquid-cache): pushdown-based
columnar caching where data is transcoded into cache-optimized "liquid"
encodings co-designed with filter semantics, so predicates evaluate
directly on encoded data.

TPU-native design (NOT a translation of the Rust reference):

* Encoded integer columns are stored as **bit-planes packed into uint32
  lanes** (plane[b] word j holds bit b of rows 32j..32j+31).  Predicate
  evaluation runs bitwise over packed words -- each uint32 VPU element
  carries 32 rows, and a comparison costs ~3*w word-ops instead of a
  full decode.  This is the TPU answer to the reference's thesis that
  "decode, not filter eval, dominates CPU" (liquid-cache VLDB paper).
* Strings are u16 dictionary codes resident on device; predicates are
  evaluated once per dictionary entry (prefix keys / fingerprints /
  FSST host path) and mapped through the code vector with a gather.
* Selection masks are packed uint32 bitmasks end-to-end
  (`liquid_tpu.ops.mask`), with Kleene-logic null handling.
* Multi-chip: `jax.sharding.Mesh` + `shard_map`, psum/all-to-all for
  distributed aggregation/join shuffle (`liquid_tpu.parallel`).

Layer map (mirrors reference SURVEY.md section 1):
  arrays/   - liquid encodings           (ref: src/core/src/liquid_array/)
  ops/      - Pallas/XLA kernels         (ref: the fastlanes/fsst hot paths)
  cache/    - cache runtime              (ref: src/core/src/cache/)
  io/       - parquet + object store     (ref: src/datafusion/src/reader/)
  sql/      - SQL frontend + operators   (ref: DataFusion integration)
  parallel/ - mesh/shuffle               (ref: n/a -- TPU-native extension)
  server/   - disaggregated mode         (ref: src/datafusion-{server,client}/)
"""

import os

import jax

# A data engine needs exact int64/float64 semantics (UserID columns, SUM/AVG
# matching DataFusion answers bit-exactly).  TPUs emulate f64/i64; correctness
# first, hot kernels use narrow types explicitly.
jax.config.update("jax_enable_x64", True)

# Persistent jit cache: the engine's kernel universe is small and
# shape-bucketed (ops/bitpack.py WIDTH_BUCKETS); cache slow compiles
# across processes (default thresholds: writing EVERY tiny executable
# measurably slows the first run, so those stay default).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/liquid_tpu_jit_cache"))
# Our kernels compile in 0.3-0.7s each (below the 1s default persistence
# threshold), so fresh processes were re-paying the whole compile set.
# 0.1s keeps real kernels persistent while skipping the trivial op-by-op
# dispatch executables (persisting those costs more than it saves).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

__version__ = "0.1.0"

def __getattr__(name):  # lazy: avoid importing heavy layers for kernel-only use
    if name in ("LiquidCache", "LiquidCacheBuilder"):
        from liquid_tpu.cache.core import LiquidCache, LiquidCacheBuilder
        return {"LiquidCache": LiquidCache, "LiquidCacheBuilder": LiquidCacheBuilder}[name]
    if name == "LiquidCacheLocalBuilder":
        from liquid_tpu.sql.session import LiquidCacheLocalBuilder
        return LiquidCacheLocalBuilder
    raise AttributeError(name)
