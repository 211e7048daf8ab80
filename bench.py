"""liquid-tpu headline benchmark (driver contract: ONE JSON line on stdout).

North-star metric (BASELINE.json): end-to-end query throughput in
rows/s/chip on ClickBench hot queries + TPC-H q1/q6, executed through
the public `LiquidCacheLocalBuilder` SQL path on the real chip --
scan -> encoded predicate -> fused device aggregation -> result.

`vs_baseline` compares the SAME queries on the SAME host in arrow mode
-- since round 4 an HONEST baseline: a host-native pyarrow engine
(hash agg/join/sort on the CPU), i.e. the reference's own "liquid vs
arrow cache" axis (BenchmarkMode, benchmark/src/lib.rs:293-308) with a
competent denominator (round 3's 68.8x was measured against this
repo's own per-block fallback; that strawman is gone).  Per-query:
liquid wins the encoded filter/LIKE class 1.7-5x; scatter-bound
grouped aggregation loses to the CPU's caches (random RMW is the
TPU's weak shape -- ~100ns/row scatters, PERF_NOTES round 4), and the
~8 MB/s tunnel taxes every result fetch.  The `routes`/`spread` maps
and SUITE_r04.json (all 43+22 queries) carry the full picture.

Round-3 changes (VERDICT r2 items 1/2/7/8):
- queries run through the fused whole-query device path (sql/fused_agg)
- hits data is synthesized HIGH-CARDINALITY (URL distinct ~ rows/5,
  RegionID ~ official 9k cardinality) instead of a bootstrap resample
  whose dictionaries stayed at the 24k-row sample's cardinality
- warm-up reports transcode and compile+first-exec separately
- an `operators` map reports per-operator rows/s + HBM roofline
  fraction measured on the benchmark's own resident columns

Timing notes (PERF_NOTES.md): through the axon tunnel host fetches have
a ~28 ms floor and block_until_ready is unreliable, so queries are
timed wall-clock around the full public call (the fetch IS part of an
end-to-end query); each query runs once warm-up + best of ITERS.
"""
import json
import os
import sys
import time

import numpy as np

ITERS = 3

#: v5e HBM bandwidth (bytes/s) for roofline fractions
HBM_BYTES_PER_S = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prepare_hits(rows: int) -> str:
    """Synthesize a high-cardinality hits table from the vendored
    nano_hits sample: per-column value distributions come from the real
    data, but string/grouping cardinalities SCALE with the row count
    (official ClickBench: URL distinct ~0.18x rows, RegionID ~9k)
    instead of being capped at the 24k-row sample's dictionary."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    here = os.path.dirname(os.path.abspath(__file__))
    src_path = os.path.join(here, "benchmark/data/nano_hits.parquet")
    out = f"/tmp/liquid_bench_hits_hc_{rows}.parquet"
    if os.path.exists(out):
        return out
    src = pq.read_table(src_path)
    rng = np.random.default_rng(7)
    idx = rng.integers(0, src.num_rows, rows)
    big = src.take(pa.array(idx, pa.int64()))
    cols = {n: big.column(n) for n in big.column_names}

    # URL / Title / SearchPhrase: append a skewed suffix id so distinct
    # count scales with rows (~rows/5 for URL; phrases stay emptier)
    n_url = max(rows // 5, 1)
    sfx = (rng.zipf(1.4, rows) % n_url).astype(np.int64)
    url = pc.binary_join_element_wise(
        cols["URL"].combine_chunks().cast(pa.string()),
        pa.array([f"?sid={s}" for s in sfx], pa.string()), "")
    cols["URL"] = url
    phr = cols["SearchPhrase"].combine_chunks().cast(pa.string())
    nonempty = pc.not_equal(phr, "")
    psfx = pa.array([f" {s % max(rows // 50, 1)}" for s in sfx], pa.string())
    cols["SearchPhrase"] = pc.if_else(
        nonempty, pc.binary_join_element_wise(phr, psfx, ""), phr)

    # RegionID: zipf-skewed over the official ~9k cardinality
    n_reg = min(9000, max(64, rows // 450))
    cols["RegionID"] = pa.array(
        (rng.zipf(1.3, rows) % n_reg).astype(np.int32), pa.int32())

    big = pa.table(cols)
    pq.write_table(big, out + ".tmp", row_group_size=1 << 20)
    os.replace(out + ".tmp", out)
    return out


def prepare_tpch(sf: float) -> dict:
    """lineitem + orders + customer parquet at scale `sf` (orders and
    customer feed the q3 join)."""
    names = ("lineitem", "orders", "customer")
    paths = {n: f"/tmp/liquid_bench_{n}_{sf}.parquet" for n in names}
    if not all(os.path.exists(p) for p in paths.values()):
        import pyarrow.parquet as pq
        from liquid_tpu.bench.tpch_data import generate
        t = generate(sf)
        for n in names:
            pq.write_table(t[n], paths[n] + ".tmp",
                           row_group_size=1 << 20)
            os.replace(paths[n] + ".tmp", paths[n])
    return paths


#: (name, table, needed columns, sql)
def queries(hits_rows, li_rows):
    Q1 = """SELECT l_returnflag, l_linestatus, sum(l_quantity) as sum_qty,
 sum(l_extendedprice) as sum_base_price,
 sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
 sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
 avg(l_quantity) as avg_qty, avg(l_extendedprice) as avg_price,
 avg(l_discount) as avg_disc, count(*) as count_order
 FROM lineitem WHERE l_shipdate <= date '1998-09-02'
 GROUP BY l_returnflag, l_linestatus
 ORDER BY l_returnflag, l_linestatus"""
    Q6 = """SELECT sum(l_extendedprice * l_discount) as revenue
 FROM lineitem WHERE l_shipdate >= date '1994-01-01'
 AND l_shipdate < date '1995-01-01'
 AND l_discount between 0.05 and 0.07 AND l_quantity < 24"""
    Q3 = """SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount))
 as revenue, o_orderdate, o_shippriority
 FROM customer, orders, lineitem
 WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
 AND l_orderkey = o_orderkey AND o_orderdate < date '1995-03-15'
 AND l_shipdate > date '1995-03-15'
 GROUP BY l_orderkey, o_orderdate, o_shippriority
 ORDER BY revenue desc, o_orderdate, l_orderkey LIMIT 10"""
    # NOTE: l_orderkey rides as a trailing sort key so the LIMIT
    # boundary is a TOTAL order -- two correct engines could otherwise
    # legally return different tie rows and fail the equality gate.
    #: (name, {table: [warm columns]}, rows, sql)
    return [
        ("cb_filter", {"hits": ["AdvEngineID"]}, hits_rows,
         'SELECT COUNT(*) FROM hits WHERE "AdvEngineID" <> 0'),
        ("cb_groupby",
         {"hits": ["RegionID", "AdvEngineID", "ResolutionWidth"]},
         hits_rows,
         'SELECT "RegionID", SUM("AdvEngineID"), COUNT(*) AS c, '
         'AVG("ResolutionWidth") FROM hits GROUP BY "RegionID" '
         'ORDER BY c DESC, "RegionID" LIMIT 10'),
        ("cb_like", {"hits": ["URL"]}, hits_rows,
         'SELECT COUNT(*) FROM hits WHERE "URL" LIKE \'%yandex%\''),
        ("tpch_q1", {"lineitem": [
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate"]},
         li_rows, Q1),
        ("tpch_q6", {"lineitem": [
            "l_extendedprice", "l_discount", "l_shipdate",
            "l_quantity"]}, li_rows, Q6),
        # the join headline (BASELINE config 3 names Q3 explicitly):
        # fused star path builds customer/orders device index tables
        # and probes them from the lineitem scan
        ("tpch_q3", {"lineitem": ["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"],
                     "orders": ["o_orderkey", "o_custkey", "o_orderdate",
                                "o_shippriority"],
                     "customer": ["c_custkey", "c_mktsegment"]},
         li_rows, Q3),
    ]


def run_mode(mode, paths, qs):
    from liquid_tpu.bench.runner import make_session
    from liquid_tpu.sql.fused_agg import STATS
    import tempfile
    ctx, cache = make_session(mode, 16 << 30, tempfile.mkdtemp())
    for name, path in paths.items():
        ctx.register_parquet(name, path)
    times = {}
    results = {}
    routes = {}
    # warm-up phase 1: transcode (parquet read + encode, host-only)
    t0 = time.perf_counter()
    for name, tcols, rows, sql in qs:
        for table, cols in tcols.items():
            pt = ctx._tables[table]
            for rg in range(pt.num_row_groups):
                for c in cols:
                    pt.ensure_cached(rg, c)
    t_transcode = time.perf_counter() - t0
    # warm-up phase 2: compile + first execution
    t0 = time.perf_counter()
    for name, tcols, rows, sql in qs:
        results[name] = ctx.sql(sql).to_arrow()
    t_compile = time.perf_counter() - t0
    log(f"[{mode}] warm-up: transcode {t_transcode:.1f}s, "
        f"compile+first-exec {t_compile:.1f}s")
    spreads = {}
    for name, tcols, rows, sql in qs:
        runs = []
        for _ in range(ITERS):
            b_f = STATS.get("fused_queries", 0)
            b_s = STATS.get("star_queries", 0)
            t0 = time.perf_counter()
            ctx.sql(sql)
            runs.append(time.perf_counter() - t0)
            routes[name] = ("star" if STATS.get("star_queries", 0) > b_s
                            else "fused"
                            if STATS.get("fused_queries", 0) > b_f
                            else "classic")
        best = min(runs)
        times[name] = best
        # run-to-run spread through the shared tunnel is 1.5-2x
        # (PERF_NOTES round 4): report it so regressions are
        # distinguishable from noise (VERDICT r3 weak #7)
        spreads[name] = round(max(runs) / max(best, 1e-9), 2)
        log(f"[{mode}] {name}: {best * 1000:.1f} ms "
            f"({rows / best / 1e6:.1f} Mrows/s) [{routes[name]}] "
            f"spread x{spreads[name]}")
    return times, results, (t_transcode, t_compile), ctx, routes, spreads


def _timed_loop(fn, args, iters):
    """Wall time per iteration of `fn(acc, *args) -> int32 scalar`,
    amortized inside ONE jit.  `fn` MUST mix `acc` into its computation
    (a varying constant / input xor), otherwise XLA hoists the body out
    of the loop.  The tunnel's ~28ms dispatch/fetch floor is subtracted
    via a probe."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(acc, *a).astype(jnp.int64)
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))

    @jax.jit
    def probe(x):
        return x.sum(dtype=jnp.int64)

    pr = jnp.arange(8, dtype=jnp.int64)
    int(loop(*args))
    int(probe(pr))
    tl = min(_t1(loop, args) for _ in range(3))
    fl = min(_t1(probe, (pr,)) for _ in range(3))
    return max(tl - fl, 1e-9) / iters


def _t1(fn, args):
    t0 = time.perf_counter()
    int(fn(*args))
    return time.perf_counter() - t0


def operator_rooflines(ctx):
    """Per-operator rows/s + HBM roofline fractions measured on the
    benchmark's OWN resident encoded columns (north star: every
    operator within 1.5x of roofline)."""
    import jax.numpy as jnp
    from liquid_tpu.ops import bitpack as bp
    from liquid_tpu.ops import hashagg as hops
    from liquid_tpu.sql.fused_agg import _in_interval_many

    out = {}
    pt = ctx._tables["hits"]
    preps = getattr(pt, "_fused_prep", {})

    def prep_of(col):
        variants = preps.get(col)
        if not variants:
            return None
        return next(iter(variants.values()))[1]

    def emit(name, n, nbytes, per, total_s):
        if total_s < 0.02:
            # measured interval is inside the dispatch-floor noise:
            # refuse to report garbage (PERF_NOTES.md timing rules)
            out[name] = {"unreliable_below_floor_s": total_s}
            return
        out[name] = {
            "rows_per_s": n / per, "gbytes_per_s": nbytes / per / 1e9,
            "roofline_frac": (nbytes / per) / HBM_BYTES_PER_S}

    def iters_for(nbytes, target=4e9):
        return max(8, min(1024, int(target / max(nbytes, 1))))
    adv = prep_of("AdvEngineID")
    if adv is not None and adv.kind == "planes":
        st = adv.planes_stack
        n = st.shape[0] * 8192
        lo = jnp.asarray(np.ones(st.shape[0], np.uint64))
        hi = jnp.asarray(np.full(st.shape[0], (1 << 62), np.uint64))

        def filt(acc, s):
            # acc mixes into the constant: the loop body cannot hoist
            l2 = lo + (acc.astype(jnp.uint64) & jnp.uint64(1))
            return _in_interval_many(s, l2, hi).sum(dtype=jnp.int32)

        nb = st.size * 4 * 2
        it = iters_for(nb)
        per = _timed_loop(filt, (st,), it)
        emit("encoded_filter", n, nb, per, per * it)

        def dec(acc, s):
            s2 = s ^ (acc & 1).astype(jnp.uint32)  # fuses into the read
            return bp.unpack_bitplanes_many(s2, jnp.uint32).sum(
                dtype=jnp.uint32).astype(jnp.int32)

        nb = st.size * 4 + n * 4
        it = iters_for(nb)
        per = _timed_loop(dec, (st,), it)
        emit("decode", n, nb, per, per * it)
    reg = prep_of("RegionID")
    if reg is not None and reg.kind == "planes":
        # round 4: the engine's grouped path is the Pallas VMEM
        # histogram (one pass, all columns); report it alongside the
        # legacy XLA-scatter measurement.  Scatter work is LATENCY
        # bound, so ns/row is the honest metric (HBM roofline fractions
        # mislead for random RMW).
        try:
            from liquid_tpu.ops import bitpack as bp2
            from liquid_tpu.ops import grouphist_pallas as gh
            if gh.HAVE_PALLAS:
                import jax
                refs = jnp.asarray(reg.refs)
                st = reg.planes_stack
                n = st.shape[0] * 8192
                M = 1 << 14

                @jax.jit
                def ghist(s):
                    off = bp2.unpack_bitplanes_many(s, jnp.uint32)
                    codes = (off.astype(jnp.int64)
                             + refs[:, None]).reshape(-1)
                    slot = jnp.clip(codes, 0, M).astype(jnp.int32)
                    vals = jnp.stack(
                        [jnp.ones(n, jnp.int32)] * 4, axis=1)
                    tb = gh.group_accumulate(slot, vals, M, 128)
                    return tb.sum(dtype=jnp.int64).astype(jnp.int32)

                int(ghist(st))
                best = min(_t1(ghist, (st,)) for _ in range(3))
                out["grouped_accumulate_pallas"] = {
                    "rows_per_s": n / best,
                    "ns_per_row": best / n * 1e9,
                    "cols": 4,
                    "note": "latency-bound op: ns/row is the metric",
                }
        except Exception as e:
            out["grouped_accumulate_pallas"] = {"error": str(e)[:120]}
        st = reg.planes_stack
        refs = jnp.asarray(reg.refs)
        n = st.shape[0] * 8192
        valid = jnp.ones(n, jnp.bool_)
        vz = jnp.zeros(n, jnp.bool_)

        def agg(acc, s):
            s2 = s ^ (acc & 1).astype(jnp.uint32)
            off = bp.unpack_bitplanes_many(s2, jnp.uint32)
            codes = (off.astype(jnp.int64) + refs[:, None]).reshape(-1)
            ones = jnp.ones(n, jnp.int64)
            _, ng, _, _, outs, _ = hops.hash_group_reduce(
                (codes,), (vz,), valid, (ones,), (vz,), ("sum",),
                1 << 14, 0x9E3779B97F4A7C15)
            return ng.astype(jnp.int32)

        nb = st.size * 4 + n * (8 + 8 + 4)
        it = iters_for(nb)
        per = _timed_loop(agg, (st,), it)
        emit("hash_groupby", n, nb, per, per * it)
    url = prep_of("URL")
    if url is not None and url.kind == "dict":
        st = url.codes_stack
        n = st.size
        lut = jnp.asarray(np.zeros((st.shape[0], url.dmax), bool))

        def gather(acc, s):
            s2 = jnp.clip(s + (acc & 1).astype(jnp.int32), 0,
                          lut.shape[1] - 1)
            return jnp.take_along_axis(lut, s2, axis=1).sum(
                dtype=jnp.int32)

        nb = n * 4 + n * 1
        it = iters_for(nb)
        per = _timed_loop(gather, (st,), it)
        emit("dict_verdict_gather", n, nb, per, per * it)
    return out


def micro_kernel_line():
    """Secondary line: the round-1 packed-compare micro-kernel."""
    try:
        import jax
        import jax.numpy as jnp
        from liquid_tpu.ops import bitpack as bp
        from liquid_tpu.ops import bitpack_pallas as bpp
        on_tpu = jax.default_backend() == "tpu"
        n = 1 << 27 if on_tpu else 1 << 22
        iters = 256
        width = 10
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1 << width, n).astype(np.uint64)
        tiles = bpp.prep(jnp.asarray(bp.pack_bitplanes_host(vals, width)))
        cs = jnp.asarray(rng.integers(1, 1 << width, iters).astype(np.uint32))

        @jax.jit
        def fused(tiles, cs):
            def body(i, acc):
                return (acc + bpp.count_gt(tiles, cs[i])).astype(jnp.int32)
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        @jax.jit
        def floor_probe(cs):
            return cs.sum(dtype=jnp.uint32)

        int(fused(tiles, cs))
        int(floor_probe(cs))
        tf = min(_t1(fused, (tiles, cs)) for _ in range(3))
        fl = min(_t1(floor_probe, (cs,)) for _ in range(3))
        per = max(tf - fl, 1e-9) / iters
        log(f"[micro] packed-compare: {n / per / 1e9:.0f} Grows/s/chip")
        return n / per
    except Exception as e:  # micro line must never sink the headline
        log(f"[micro] skipped: {e}")
        return None


def run_suite():
    """Full-suite mode (BASELINE config 4 / VERDICT r3 item 3): all 43
    ClickBench queries + all 22 TPC-H queries in liquid mode on the
    chip, per-query ms + geomean + fused/star/classic routing from
    fused_agg.STATS.  Writes SUITE json; enabled via
    LIQUID_BENCH_SUITE=1 (the default driver contract single-line JSON
    is unchanged)."""
    import glob
    import math
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/liquid_tpu_jit_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import liquid_tpu  # noqa: F401
    from liquid_tpu.bench.runner import make_session
    from liquid_tpu.bench import tpch_queries
    from liquid_tpu.sql.fused_agg import STATS
    import tempfile

    on_tpu = jax.default_backend() == "tpu"
    hits_rows = int(os.environ.get(
        "LIQUID_BENCH_ROWS", str(4_000_000 if on_tpu else 100_000)))
    sf = float(os.environ.get("LIQUID_BENCH_SF",
                              "1" if on_tpu else "0.01"))
    here = os.path.dirname(os.path.abspath(__file__))
    hits_path = prepare_hits(hits_rows)

    # all 8 TPC-H tables at scale `sf`
    tdir = f"/tmp/liquid_bench_tpch_full_{sf}"
    if not os.path.exists(os.path.join(tdir, "lineitem.parquet")):
        import pyarrow.parquet as pq
        from liquid_tpu.bench.tpch_data import generate
        os.makedirs(tdir, exist_ok=True)
        for name, t in generate(sf).items():
            pq.write_table(t, f"{tdir}/{name}.parquet.tmp",
                           row_group_size=1 << 20)
            os.replace(f"{tdir}/{name}.parquet.tmp",
                       f"{tdir}/{name}.parquet")

    ctx, cache = make_session("liquid", 16 << 30, tempfile.mkdtemp())
    ctx.register_parquet("hits", hits_path)
    for p in sorted(glob.glob(f"{tdir}/*.parquet")):
        ctx.register_parquet(os.path.basename(p)[:-8], p)

    suite = []
    for i in range(43):
        with open(f"{here}/benchmark/clickbench/queries/q{i}.sql") as f:
            suite.append((f"cb_q{i}", f.read().strip()))
    for qid in sorted(tpch_queries.QUERIES):
        suite.append((f"tpch_q{qid}", tpch_queries.QUERIES[qid]))
    only = os.environ.get("LIQUID_SUITE_ONLY")
    if only:
        names = {s.strip() for s in only.split(",") if s.strip()}
        suite = [q for q in suite if q[0] in names]

    # answer verification (VERDICT r4 item 3; mirrors the reference's
    # stored-answer checks, .github/workflows/ci.yml:139-320): every
    # timed on-chip result compares against the HOST arrow engine's
    # answer for the same query+data, computed once and disk-cached.
    adir = f"/tmp/liquid_bench_answers_{hits_rows}_{sf}"
    os.makedirs(adir, exist_ok=True)
    actx = None

    def arrow_answer(name, sql):
        nonlocal actx
        import pyarrow.parquet as apq
        path = f"{adir}/{name}.parquet"
        if os.path.exists(path):
            return apq.read_table(path)
        if actx is None:
            actx, _ = make_session("arrow", 16 << 30, tempfile.mkdtemp())
            actx.register_parquet("hits", hits_path)
            for p in sorted(glob.glob(f"{tdir}/*.parquet")):
                actx.register_parquet(os.path.basename(p)[:-8], p)
        r = run_one(sql, actx)
        apq.write_table(r, path + ".tmp")
        os.replace(path + ".tmp", path)
        return r

    def run_one(sql, c=None):
        c = c if c is not None else ctx
        if isinstance(sql, list):
            out = None
            for stmt in sql:
                r = c.sql(stmt).to_arrow()
                if r.num_columns:
                    out = r
            return out
        return c.sql(sql).to_arrow()

    results = {}
    t_start = time.perf_counter()
    verify = os.environ.get("LIQUID_SUITE_VERIFY", "1") == "1"
    for name, sql in suite:
        try:
            t0 = time.perf_counter()
            try:
                got = run_one(sql)  # compile + first exec
            except Exception:
                # transient remote-compile/tunnel hiccups: retry once
                got = run_one(sql)
            first = time.perf_counter() - t0
            best = float("inf")
            route = "classic"
            for _ in range(2):
                b_f = STATS.get("fused_queries", 0)
                b_s = STATS.get("star_queries", 0)
                t0 = time.perf_counter()
                got = run_one(sql)
                best = min(best, time.perf_counter() - t0)
                route = ("star" if STATS.get("star_queries", 0) > b_s
                         else "fused"
                         if STATS.get("fused_queries", 0) > b_f
                         else "classic")
            results[name] = {"ms": round(best * 1000, 1),
                             "first_ms": round(first * 1000, 1),
                             "route": route}
            if verify:
                # the timed result itself is checked, not a rerun: a
                # wrong answer is an ERROR entry, never a timing
                resolver = _order_info(sql)
                oidx = resolver(got) if (resolver and got is not None) \
                    else None
                _assert_tables_equal(name, got, arrow_answer(name, sql),
                                     order_idx=oidx,
                                     limited=_has_limit(sql))
                results[name]["verified"] = True
            log(f"[suite] {name}: {best * 1000:.1f} ms [{route}] "
                f"(first {first:.1f}s)"
                + (" verified" if verify else ""))
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"[suite] {name}: ERROR {e}")
        _write_suite(here, results, suite, hits_rows, sf, t_start)
    out = _write_suite(here, results, suite, hits_rows, sf, t_start)
    log(f"suite written: geomean {out['value']:.1f} ms, "
        f"routes {out['routes']}")
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


def _cell_reprs(t):
    """Per-column canonical string cells (floats rounded to ~9 sig
    digits so either engine's rounding noise normalizes away)."""
    import pyarrow as pa
    out = []
    for i in range(t.num_columns):
        c = t.column(i).combine_chunks()
        if pa.types.is_floating(c.type) or pa.types.is_decimal(c.type):
            v = np.asarray(c.cast(pa.float64()), dtype=float)
            with np.errstate(invalid="ignore", divide="ignore"):
                ok = np.isfinite(v) & (v != 0)
                ex = np.where(ok, np.floor(np.log10(
                    np.where(ok, np.abs(v), 1.0))), 0.0)
                q = np.power(10.0, ex - 8)  # keep ~9 significant digits
                r = np.where(ok, np.round(v / q) * q, v)
            out.append(np.asarray([repr(float(x)) for x in r], object))
        else:
            out.append(np.asarray([repr(x) for x in c.to_pylist()],
                                  object))
    return out


def _assert_tables_equal(name, a, b, order_idx=None, limited=False):
    """Answer equality, tolerant of the ONE legal divergence between
    correct engines: tie selection at a LIMIT/OFFSET boundary.  The
    ORDER BY key columns must match as exact multisets; full rows must
    match as multisets except rows whose key tuple equals a boundary
    (extreme) key tuple -- those may legally differ when tied."""
    from collections import Counter
    import pyarrow as pa
    if a is None or b is None:
        assert a is None and b is None, (name, "one side empty")
        return
    assert a.num_rows == b.num_rows, (
        f"{name}: rows {a.num_rows} != {b.num_rows}")
    assert a.num_columns == b.num_columns, (
        f"{name}: cols {a.num_columns} != {b.num_columns}")
    # harmonize numeric column typing: a distributed/partial engine may
    # legally widen ints to floats -- compare by VALUE
    def widen(t, other):
        cols = []
        for i in range(t.num_columns):
            c = t.column(i).combine_chunks()
            o = other.column(i)
            if pa.types.is_integer(c.type) and (
                    pa.types.is_floating(o.type)
                    or pa.types.is_decimal(o.type)):
                c = c.cast(pa.float64())
            cols.append(c)
        return pa.table({f"c{i}": c for i, c in enumerate(cols)})
    a2, b2 = widen(a, b), widen(b, a)
    ca, cb = _cell_reprs(a2), _cell_reprs(b2)
    rows_a = list(zip(*ca)) if ca else []
    rows_b = list(zip(*cb)) if cb else []
    diff = Counter(rows_a)
    diff.subtract(Counter(rows_b))
    bad = {r for r, c in diff.items() if c != 0}
    if not bad:
        return
    if limited and not order_idx:
        # LIMIT without ORDER BY: ANY k rows are a legal answer --
        # only cardinality is checkable
        return
    if not (limited and order_idx):
        raise AssertionError(
            f"{name}: {len(bad)} differing rows, e.g. "
            f"{sorted(bad)[:2]}")
    # key multisets must agree exactly
    keys_a = Counter(zip(*[ca[i] for i in order_idx]))
    keys_b = Counter(zip(*[cb[i] for i in order_idx]))
    assert keys_a == keys_b, (
        f"{name}: ORDER BY key multisets differ: "
        f"{sorted((keys_a - keys_b).items())[:2]} vs "
        f"{sorted((keys_b - keys_a).items())[:2]}")
    # every differing row must sit at a boundary key tuple (first/last
    # in either table's own order -- LIMIT head, OFFSET tail)
    bounds = set()
    for cells, n in ((ca, a.num_rows), (cb, b.num_rows)):
        if n:
            bounds.add(tuple(cells[i][0] for i in order_idx))
            bounds.add(tuple(cells[i][-1] for i in order_idx))
    for r in bad:
        k = tuple(r[i] for i in order_idx)
        assert k in bounds, (
            f"{name}: non-boundary row differs: {r} (key {k}, "
            f"bounds {sorted(bounds)[:4]})")


def _has_limit(sql) -> bool:
    from liquid_tpu.sql.parser import parse_statement
    text = sql[-1] if isinstance(sql, list) else sql
    try:
        stmt = parse_statement(text)
        return stmt[0] == "select" and stmt[1].limit is not None
    except Exception:
        return False


def _order_info(sql):
    """(order column indices resolver, limited) for tie-aware answer
    comparison; returns a function of the result table."""
    from liquid_tpu.sql.parser import parse_statement
    from liquid_tpu.sql.physical import render
    from liquid_tpu.sql import ast as sqlast
    text = sql[-1] if isinstance(sql, list) else sql
    try:
        stmt = parse_statement(text)
        if stmt[0] != "select":
            return None
        q = stmt[1]
    except Exception:
        return None
    if q.limit is None or not q.order_by:
        return None
    names = []
    for o in q.order_by:
        e = o.expr
        if isinstance(e, sqlast.Literal) and isinstance(e.value, int):
            names.append(("pos", e.value - 1))
        else:
            names.append(("name", render(e)))
    alias_of = {render(it.expr): (it.alias or render(it.expr))
                for it in q.items}

    def resolve(table):
        idx = []
        cols = list(table.column_names)
        for kind, v in names:
            if kind == "pos":
                if not (0 <= v < len(cols)):
                    return None
                idx.append(v)
                continue
            nm = alias_of.get(v, v)
            if nm in cols:
                idx.append(cols.index(nm))
            elif v in cols:
                idx.append(cols.index(v))
            else:
                return None
        return idx
    return resolve


def _write_suite(here, results, suite, hits_rows, sf, t_start):
    """Write the suite artifact incrementally (a wall-clock-killed run
    still leaves every completed query on disk).  Default SUITE_r05.json;
    override with LIQUID_SUITE_OUT for scratch runs."""
    import math
    ok = [r["ms"] for r in results.values() if "ms" in r]
    geomean = (math.exp(sum(math.log(max(v, 0.1)) for v in ok) / len(ok))
               if ok else None)
    routed = {}
    for r in results.values():
        routed[r.get("route", "error")] = routed.get(
            r.get("route", "error"), 0) + 1
    out = {
        "metric": "suite_geomean_ms",
        "value": geomean,
        "unit": "ms",
        "hits_rows": hits_rows, "tpch_sf": sf,
        "completed": len(ok), "total": len(suite),
        "routes": routed,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "queries": results,
    }
    path = os.environ.get("LIQUID_SUITE_OUT",
                          os.path.join(here, "SUITE_r05.json"))
    with open(path + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(path + ".tmp", path)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/liquid_tpu_jit_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import liquid_tpu  # noqa: F401

    on_tpu = jax.default_backend() == "tpu"
    hits_rows = int(os.environ.get(
        "LIQUID_BENCH_ROWS", str(4_000_000 if on_tpu else 200_000)))
    sf = float(os.environ.get("LIQUID_BENCH_SF",
                              "1" if on_tpu else "0.02"))
    log(f"backend={jax.default_backend()} hits_rows={hits_rows} sf={sf}")
    hits_path = prepare_hits(hits_rows)
    tpch_paths = prepare_tpch(sf)
    paths = dict(tpch_paths, hits=hits_path)
    import pyarrow.parquet as pq
    li_rows = pq.ParquetFile(tpch_paths["lineitem"]).metadata.num_rows
    import pyarrow.compute as pc
    hits_t = pq.read_table(hits_path, columns=["URL", "RegionID"])
    card = {"url_distinct": pc.count_distinct(hits_t.column("URL")).as_py(),
            "region_distinct":
                pc.count_distinct(hits_t.column("RegionID")).as_py(),
            "hits_rows": hits_rows, "lineitem_rows": li_rows,
            "hits_bytes": os.path.getsize(hits_path),
            "lineitem_bytes": os.path.getsize(tpch_paths["lineitem"])}
    del hits_t
    log(f"data: {card}")
    qs = queries(hits_rows, li_rows)

    t_liquid, r_liquid, warm_l, ctx_l, routes, spreads = run_mode(
        "liquid", paths, qs)
    ops = operator_rooflines(ctx_l)
    for k, v in ops.items():
        if "rows_per_s" not in v:
            log(f"[op] {k}: below timing floor, not reported")
            continue
        if "gbytes_per_s" in v:
            log(f"[op] {k}: {v['rows_per_s'] / 1e9:.2f} Grows/s, "
                f"{v['gbytes_per_s']:.0f} GB/s, "
                f"roofline {v['roofline_frac'] * 100:.0f}%")
        else:  # latency-bound ops report ns/row
            log(f"[op] {k}: {v['rows_per_s'] / 1e6:.0f} Mrows/s, "
                f"{v.get('ns_per_row', 0):.1f} ns/row")
    del ctx_l
    t_arrow, r_arrow, warm_a, ctx_a, _ra, _sa = run_mode(
        "arrow", paths, qs)
    del ctx_a
    # correctness gate: both modes must agree before any number is
    # reported (the reference's answer-verification, clickbench_client.rs)
    import pyarrow as pa
    for name, _, _, _ in qs:
        a, b = r_liquid[name], r_arrow[name]
        assert a.num_rows == b.num_rows, (name, a.num_rows, b.num_rows)
        for col in range(a.num_columns):
            ca, cb = a.column(col), b.column(col)
            if pa.types.is_floating(ca.type) or pa.types.is_decimal(ca.type):
                va = np.asarray(ca.cast(pa.float64()), dtype=float)
                vb = np.asarray(cb.cast(pa.float64()), dtype=float)
                assert np.allclose(va, vb, rtol=1e-9, equal_nan=True), name
            else:
                assert ca.to_pylist() == cb.to_pylist(), name
    log("correctness gate: liquid == arrow on all queries")

    total_rows = sum(rows for _, _, rows, _ in qs)
    sum_liquid = sum(t_liquid.values())
    sum_arrow = sum(t_arrow.values())
    value = total_rows / sum_liquid
    vs = sum_arrow / sum_liquid
    log(f"totals: liquid {sum_liquid * 1000:.0f} ms, "
        f"arrow {sum_arrow * 1000:.0f} ms")

    micro = micro_kernel_line()

    print(json.dumps({
        "metric": "e2e_query_rows_per_s",
        "value": value,
        "unit": "rows/s/chip",
        "vs_baseline": vs,
        "queries_ms": {k: round(v * 1000, 1) for k, v in t_liquid.items()},
        "arrow_ms": {k: round(v * 1000, 1) for k, v in t_arrow.items()},
        "warmup_s": {"liquid_transcode": round(warm_l[0], 1),
                     "liquid_compile": round(warm_l[1], 1),
                     "arrow_transcode": round(warm_a[0], 1),
                     "arrow_compile": round(warm_a[1], 1)},
        "data": card,
        "routes": routes,
        "spread": spreads,
        "operators": ops,
        "micro_packed_compare_rows_per_s": micro,
    }))


if __name__ == "__main__":
    if os.environ.get("LIQUID_BENCH_SUITE") == "1":
        run_suite()
    else:
        main()
