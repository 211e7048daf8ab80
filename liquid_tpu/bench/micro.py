"""Micro-benchmark registry: the divan-bench equivalents.

The reference registers 14 divan/study micro-benchmarks in
`src/core/Cargo.toml:60-130` (fsst_view, fsst_selectivity, bitpacking,
byte_view_compare, squeeze_date32, primitive_encoding, linear_integer,
cache_storage, string_fingerprint, filter_selectivity_ambiguity,
prefix_differentiability) plus the datafusion-crate benches (eviction,
filter pushdown, boolean and-then).  This module provides one named
benchmark per reference bench, each timing the liquid-tpu equivalent
operation and reporting a throughput / ratio dict.

Usage:
    python -m liquid_tpu.bench.micro             # run all, table to stderr
    python -m liquid_tpu.bench.micro bitpacking  # run one
    run_all(tiny=True)                           # CI smoke (small inputs)

Every benchmark returns a dict with at least {"name", "value", "unit"};
timings are best-of-iters wall clock around a host-observable result
(PERF_NOTES.md: through the device tunnel only host fetches reliably
synchronize).
"""
from __future__ import annotations

import json
import sys
import time
from typing import Callable, Dict, List

import numpy as np
import pyarrow as pa

REGISTRY: Dict[str, Callable[[bool], dict]] = {}


def bench(name: str):
    def deco(fn):
        REGISTRY[name] = fn
        return fn
    return deco


def _best_of(fn, iters: int = 5) -> float:
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _words(n: int, seed: int = 0, vocab: int = 4096) -> pa.Array:
    rng = np.random.default_rng(seed)
    pool = ["".join(rng.choice(list("abcdefghij-/."), size=rng.integers(3, 24)))
            for _ in range(vocab)]
    return pa.array([pool[i] for i in rng.integers(0, vocab, n)], pa.string())


# -- 1. bitpacking (ref bench/bitpacking.rs: fastlanes pack/unpack) ----------

@bench("bitpacking")
def bench_bitpacking(tiny: bool) -> dict:
    import jax.numpy as jnp
    from liquid_tpu.ops import bitpack as bp
    n = 1 << (13 if tiny else 20)
    width = 10
    vals = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << width, n, dtype=np.uint32))
    planes = bp.pack_bitplanes(vals, width)
    _ = np.asarray(bp.unpack_bitplanes(planes))  # compile
    dt = _best_of(lambda: np.asarray(bp.unpack_bitplanes(planes)))
    return {"name": "bitpacking", "value": n / dt / 1e9,
            "unit": "Grows/s unpack", "rows": n, "width": width}


# -- 2. primitive_encoding (ref bench/primitive_encoding.rs) -----------------

@bench("primitive_encoding")
def bench_primitive_encoding(tiny: bool) -> dict:
    from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
    n = 8192
    arr = pa.array(np.random.default_rng(0).integers(0, 1000, n), pa.int32())
    iters = 2 if tiny else 20
    dt_enc = _best_of(lambda: LiquidPrimitiveArray.from_arrow(arr), iters)
    liq = LiquidPrimitiveArray.from_arrow(arr)
    dt_dec = _best_of(lambda: liq.to_arrow(), iters)
    return {"name": "primitive_encoding", "value": n / dt_enc / 1e6,
            "unit": "Mrows/s encode", "decode_mrows_s": n / dt_dec / 1e6,
            "ratio": liq.memory_bytes() / (4 * n)}


# -- 3. linear_integer (ref bench/linear_integer.rs) -------------------------

@bench("linear_integer")
def bench_linear_integer(tiny: bool) -> dict:
    from liquid_tpu.arrays.linear import LiquidLinearArray
    n = 8192
    base = np.arange(n, dtype=np.int64) * 7
    noise = np.random.default_rng(0).integers(-3, 4, n)
    arr = pa.array(base + noise, pa.int64())
    iters = 2 if tiny else 20
    dt = _best_of(lambda: LiquidLinearArray.from_arrow(arr), iters)
    liq = LiquidLinearArray.from_arrow(arr)
    return {"name": "linear_integer", "value": n / dt / 1e6,
            "unit": "Mrows/s encode", "ratio": liq.memory_bytes() / (8 * n)}


# -- 4. fsst_view (ref bench/fsst_view.rs: compress/decompress) --------------

@bench("fsst_view")
def bench_fsst_view(tiny: bool) -> dict:
    from liquid_tpu.arrays.fsst import FsstCompressor
    n = 1 << (10 if tiny else 14)
    vals = _words(n, vocab=256)
    comp = FsstCompressor.train_on_arrow(vals)
    raw = b"".join(v.encode() for v in vals.to_pylist())
    packed = comp.compress(raw)
    iters = 3 if tiny else 10
    dt_c = _best_of(lambda: comp.compress(raw), iters)
    dt_d = _best_of(lambda: comp.decompress(packed), iters)
    return {"name": "fsst_view", "value": len(raw) / dt_c / 1e6,
            "unit": "MB/s compress", "decompress_mb_s": len(raw) / dt_d / 1e6,
            "ratio": len(packed) / len(raw)}


# -- 5. byte_view_compare (ref bench/byte_view_compare.rs) -------------------

@bench("byte_view_compare")
def bench_byte_view_compare(tiny: bool) -> dict:
    from liquid_tpu.arrays.base import Predicate
    from liquid_tpu.arrays.byteview import LiquidByteViewArray
    n = 8192
    liq = LiquidByteViewArray.from_arrow(_words(n), with_fingerprints=True)
    needle = _words(1, seed=1).to_pylist()[0]
    preds = [Predicate("eq", needle), Predicate("lt", needle),
             Predicate("contains", needle[:2])]
    iters = 2 if tiny else 20

    def run():
        from liquid_tpu.ops import mask as mops
        for p in preds:
            m = liq.try_eval_predicate(p)
            assert m is not None
            int(mops.count(m.to_selection()))
    dt = _best_of(run, iters)
    return {"name": "byte_view_compare", "value": len(preds) * n / dt / 1e6,
            "unit": "Mrows/s (3 ops)"}


# -- 6. fsst_selectivity (ref bench/fsst_selectivity.rs) ---------------------

@bench("fsst_selectivity")
def bench_fsst_selectivity(tiny: bool) -> dict:
    from liquid_tpu.arrays.base import Predicate
    from liquid_tpu.arrays.byteview import LiquidByteViewArray
    n = 8192
    vals = _words(n)
    liq = LiquidByteViewArray.from_arrow(vals, with_fingerprints=True)
    uniq = sorted(set(vals.to_pylist()))
    out = {}
    iters = 2 if tiny else 10
    for frac, lit in (("0.01", uniq[len(uniq) // 100]),
                      ("0.50", uniq[len(uniq) // 2]),
                      ("0.99", uniq[-1])):
        from liquid_tpu.ops import mask as mops
        pred = Predicate("lt_eq", lit)
        dt = _best_of(
            lambda p=pred: int(mops.count(
                liq.try_eval_predicate(p).to_selection())), iters)
        out[f"sel_{frac}_mrows_s"] = n / dt / 1e6
    return {"name": "fsst_selectivity", "value": out["sel_0.50_mrows_s"],
            "unit": "Mrows/s @50%", **out}


# -- 7. string_fingerprint (ref study/string-fingerprint.rs) -----------------

@bench("string_fingerprint")
def bench_string_fingerprint(tiny: bool) -> dict:
    from liquid_tpu.arrays.byteview import _fingerprints, _needle_fingerprint
    n = 1 << (10 if tiny else 13)
    vals = _words(n, vocab=n)
    iters = 2 if tiny else 10
    dt = _best_of(lambda: _fingerprints(vals), iters)
    fps = _fingerprints(vals)
    needle = b"zq"  # rare: fingerprints should prune nearly everything
    need = np.uint32(_needle_fingerprint(needle))
    cand = ((fps & need) == need).mean()
    return {"name": "string_fingerprint", "value": n / dt / 1e6,
            "unit": "Mstrings/s build", "candidate_rate": float(cand)}


# -- 8. squeeze_date32 (ref bench/squeeze_date32.rs) -------------------------

@bench("squeeze_date32")
def bench_squeeze_date32(tiny: bool) -> dict:
    from liquid_tpu.arrays.hybrid import squeeze_date32
    from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
    n = 8192
    days = np.random.default_rng(0).integers(8000, 20000, n, dtype=np.int32)
    liq = LiquidPrimitiveArray.from_arrow(pa.array(days, pa.date32()))
    iters = 2 if tiny else 10
    dt = _best_of(lambda: squeeze_date32(liq, "year"), iters)
    sq, _ = squeeze_date32(liq, "year")
    dt_read = _best_of(lambda: sq.to_component_array("year"), iters)
    return {"name": "squeeze_date32", "value": n / dt / 1e6,
            "unit": "Mrows/s squeeze", "component_read_mrows_s": n / dt_read / 1e6,
            "squeezed_ratio": sq.memory_bytes() / (4 * n)}


# -- 9. cache_storage (ref bench/cache_storage.rs: insert/get loop) ----------

@bench("cache_storage")
def bench_cache_storage(tiny: bool) -> dict:
    from liquid_tpu.cache.core import LiquidCacheBuilder
    n_entries = 8 if tiny else 64
    arr = pa.array(np.random.default_rng(0).integers(0, 1000, 8192), pa.int64())
    cache = LiquidCacheBuilder().with_max_memory_bytes(1 << 30).build()
    t0 = time.perf_counter()
    for i in range(n_entries):
        cache.insert(i, arr)
    dt_ins = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_entries):
        cache.get(i)
    dt_get = time.perf_counter() - t0
    return {"name": "cache_storage",
            "value": n_entries * 8192 / dt_ins / 1e6,
            "unit": "Mrows/s insert",
            "get_mrows_s": n_entries * 8192 / dt_get / 1e6}


# -- 10. eviction (ref datafusion bench: insert under memory pressure) -------

@bench("eviction")
def bench_eviction(tiny: bool) -> dict:
    import tempfile
    from liquid_tpu.cache.core import LiquidCacheBuilder
    n_entries = 16 if tiny else 128
    arr = pa.array(np.random.default_rng(0).integers(0, 1 << 20, 8192),
                   pa.int64())
    with tempfile.TemporaryDirectory() as d:
        cache = (LiquidCacheBuilder()
                 .with_max_memory_bytes(96 * 1024)   # forces the squeeze loop
                 .with_disk_path(d + "/store.bin").build())
        t0 = time.perf_counter()
        for i in range(n_entries):
            cache.insert(i, arr)
        dt = time.perf_counter() - t0
        st = cache.stats()
    return {"name": "eviction", "value": n_entries * 8192 / dt / 1e6,
            "unit": "Mrows/s insert-under-pressure",
            "squeezes": st.get("squeezes", 0),
            "disk_evictions": st.get("disk_evictions", 0)}


# -- 11. filter_pushdown (ref datafusion bench: encoded predicate eval) ------

@bench("filter_pushdown")
def bench_filter_pushdown(tiny: bool) -> dict:
    from liquid_tpu.arrays.base import Predicate
    from liquid_tpu.cache.core import LiquidCacheBuilder
    n_blocks = 4 if tiny else 32
    arr = pa.array(np.random.default_rng(0).integers(0, 1000, 8192), pa.int32())
    cache = LiquidCacheBuilder().with_max_memory_bytes(1 << 30).build()
    for i in range(n_blocks):
        cache.insert(i, arr)
    pred = Predicate("lt", 500)
    ids = list(range(n_blocks))
    from liquid_tpu.ops import mask as mops
    _ = cache.eval_predicate_many(ids, pred)  # compile
    iters = 2 if tiny else 10
    dt = _best_of(
        lambda: [int(mops.count(m.to_selection()))
                 for m in cache.eval_predicate_many(ids, pred)],
        iters)
    return {"name": "filter_pushdown", "value": n_blocks * 8192 / dt / 1e6,
            "unit": "Mrows/s encoded eval"}


# -- 12. boolean_and_then (ref utils.rs:62-164 BMI2 PDEP bench) --------------

@bench("boolean_and_then")
def bench_boolean_and_then(tiny: bool) -> dict:
    import jax.numpy as jnp
    from liquid_tpu.ops import mask as mops
    n = 8192
    rng = np.random.default_rng(0)
    sel_bools = rng.random(n) < 0.5
    sel = mops.pack_bools(jnp.asarray(sel_bools))
    # `filtered` covers the k selected rows in order; pad to n (multiple
    # of the 32-bit word size) -- bits past k are ignored by and_then
    filt_bools = np.zeros(n, bool)
    k = int(sel_bools.sum())
    filt_bools[:k] = rng.random(k) < 0.5
    filt = mops.pack_bools(jnp.asarray(filt_bools))
    out = mops.and_then(sel, filt)
    _ = int(mops.count(out))  # compile
    iters = 3 if tiny else 20
    dt = _best_of(lambda: int(mops.count(mops.and_then(sel, filt))), iters)
    return {"name": "boolean_and_then", "value": n / dt / 1e6,
            "unit": "Mrows/s"}


# -- 13. filter_selectivity_ambiguity (ref study) ----------------------------

@bench("filter_selectivity_ambiguity")
def bench_filter_ambiguity(tiny: bool) -> dict:
    """How often prefix keys settle a compare without decompression,
    across needle positions (ref study/filter_selectivity_ambiguity.rs)."""
    from liquid_tpu.arrays.prefixkeys import build_prefix_meta, prefix_verdict
    n = 1 << (10 if tiny else 13)
    vals = _words(n, vocab=n)
    meta = build_prefix_meta(vals)
    uniq = sorted(set(vals.to_pylist()))
    ambs = []
    for lit in (uniq[0], uniq[len(uniq) // 2], uniq[-1]):
        verdict, amb = prefix_verdict(meta, "lt", lit.encode())
        ambs.append(float(np.mean(amb)) if amb is not None else 1.0)
    return {"name": "filter_selectivity_ambiguity",
            "value": float(np.mean(ambs)), "unit": "ambiguous fraction",
            "per_point": ambs}


# -- 14. prefix_differentiability (ref study) --------------------------------

@bench("prefix_differentiability")
def bench_prefix_differentiability(tiny: bool) -> dict:
    """Fraction of dictionary pairs distinguishable on the 8-byte prefix
    alone (ref study/prefix_differentiability.rs): sorts prefixes and
    counts adjacent ties."""
    from liquid_tpu.arrays.prefixkeys import build_prefix_meta
    n = 1 << (10 if tiny else 13)
    vals = _words(n, vocab=n)
    meta = build_prefix_meta(vals)
    p = np.sort(meta.prefixes)
    ties = float(np.mean(p[1:] == p[:-1])) if len(p) > 1 else 0.0
    return {"name": "prefix_differentiability", "value": 1.0 - ties,
            "unit": "distinguishable fraction", "dict_size": int(len(p))}


def run_all(tiny: bool = False, names: List[str] = None) -> List[dict]:
    if names:
        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            raise ValueError(
                f"unknown benchmark name(s) {unknown}; "
                f"known: {sorted(REGISTRY)}")
    results = []
    for name, fn in REGISTRY.items():
        if names and name not in names:
            continue
        results.append(fn(tiny))
    return results


def main(argv: List[str]) -> int:
    names = [a for a in argv if not a.startswith("-")]
    tiny = "--tiny" in argv
    if "--tpu" not in argv:
        # Like the reference's divan benches these are host micro-benches;
        # force CPU so jits don't ride the remote-TPU tunnel (the
        # JAX_PLATFORMS env var is ignored under the axon plugin --
        # PERF_NOTES.md).  The TPU hot-kernel bench is bench.py.
        import jax
        jax.config.update("jax_platforms", "cpu")
    try:
        results = run_all(tiny=tiny, names=names or None)
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    for r in results:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
