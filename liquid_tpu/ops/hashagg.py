"""Device hash aggregation: scatter-based grouped reduction.

The sort-based `ops.groupby.group_reduce` is exact for any key
distribution but costs one XLA variadic sort over all rows (~400 ms per
4M-element operand on v5e -- XLA's TPU sort is 10x slower than its
scatters).  This module provides the fast path: hash each key tuple to
a slot in a power-of-two table and scatter-reduce payloads per slot
(65 ms for 4M rows into 64K slots, measured PERF_NOTES.md round 2).

Collision handling is EXACT, not probabilistic: alongside the payload
scatters, each key column's code scatters per-slot min and max; a slot
is clean iff min == max for every key column (and null flag).  If any
slot is dirty the caller retries with a different salt / bigger table
and finally falls back to the sort path, so answers never depend on
hash quality.  (The reference gets GROUP BY from DataFusion's row-hash
`GroupedHashAggregateStream`; a growable hash table is the wrong shape
for XLA, so the TPU design is scatter + collision-check + retry.)
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from liquid_tpu.ops import floatbits
from liquid_tpu.ops.groupby import _neutral

#: canonical dtype key for the per-(op,dtype) scatter batches.  Mixing
#: the jnp.int64 CLASS with np.dtype('int64') (what v.dtype yields)
#: silently created TWO dict entries -- the i64 batch ran as two
#: scatter passes and the single-dtype Pallas gate never fired.
import numpy as _np
_I64 = _np.dtype('int64')

#: largest slot table (2^21 slots x ~10 i64 columns ~= 170 MB HBM)
MAX_SLOTS = 1 << 21


def pick_slots(n_rows: int) -> int:
    """Initial table size: 2x the row count (<= cardinality bound),
    capped so HBM stays bounded; floor keeps lane utilization sane."""
    h = 1024
    while h < 2 * n_rows and h < MAX_SLOTS:
        h <<= 1
    return h


def _mix(h: jax.Array, v: jax.Array) -> jax.Array:
    """64-bit mix fold (splitmix64 finalizer shape)."""
    h = h ^ v
    h = (h ^ (h >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return h ^ (h >> jnp.uint64(31))


#: packed-fetch width: groups are prefix-packed, so fetching beyond the
#: typical group count wastes transfer; > PACK_CAP groups re-fetch full
PACK_CAP = 1 << 16


#: direct-address table cap (slots x columns x 8B HBM)
DIRECT_CAP = 1 << 21


@partial(jax.jit, static_argnames=("kinds", "spans", "pallas_seg",
                                   "having"))
def direct_reduce_packed(codes, knulls, valid, vals, vnulls, kinds,
                         los, spans, pallas_seg=(), having=()):
    """Grouped reduction by DIRECT ADDRESSING: when every key column's
    value domain is densely boundable (int domain span, dictionary
    size, date range), slot = mixed-radix index of (code - lo) -- the
    slot<->key-tuple map is bijective, so collisions are IMPOSSIBLE:
    no rounds, no key-min/max scatter passes, no retry ladder.  An XLA
    TPU scatter pass costs ~100ns/row regardless of payload width
    (latency-bound), so cutting the pass count is the whole game: this
    runs ONE add pass per payload dtype (plus min/max passes only when
    the query has min/max aggregates).

    `los` traced int64[nk]; `spans` static tuple (span_i = max-min; a
    NULL key maps to the extra index span_i+1-1... i.e. index span_i).
    Output contract matches hash_rounds_reduce_packed (clean always
    True).
    """
    n = valid.shape[0]
    nk = len(codes)
    strides = []
    m = 1
    for s in reversed(spans):
        strides.append(m)
        m *= s + 2  # +1 for the domain, +1 for the NULL index
    strides = list(reversed(strides))
    slot = jnp.zeros((n,), jnp.int64)
    for i, (c, nl) in enumerate(zip(codes, knulls)):
        idx = jnp.where(nl, jnp.int64(spans[i] + 1), c - los[i])
        slot = slot + idx * jnp.int64(strides[i])
    slot = jnp.where(valid, slot, jnp.int64(m)).astype(jnp.int32)

    add_cols = {}
    min_cols = {}
    max_cols = {}
    add_cols.setdefault(_I64, []).append(
        (("occ", 0), jnp.ones((n,), jnp.int64)))
    for j, (v, vn, kind) in enumerate(zip(vals, vnulls, kinds)):
        contrib = valid & ~vn
        add_cols.setdefault(_I64, []).append(
            (("cnt", j), contrib.astype(jnp.int64)))
        if kind == "sum":
            z = jnp.where(contrib, v, jnp.zeros((), v.dtype))
            add_cols.setdefault(v.dtype, []).append((("acc", j), z))
        elif kind == "min":
            z = jnp.where(contrib, v, _neutral(v.dtype, "min"))
            min_cols.setdefault(v.dtype, []).append((("acc", j), z))
        else:
            z = jnp.where(contrib, v, _neutral(v.dtype, "max"))
            max_cols.setdefault(v.dtype, []).append((("acc", j), z))

    got = {}
    #: below this table size, masked streaming reductions beat scatter:
    #: an XLA TPU scatter is latency-bound (~100ns/row REGARDLESS of
    #: payload width; dropped rows still cost ~67ns) while a masked
    #: full-array reduce runs at HBM bandwidth -- m passes over the
    #: payloads cost m*n*K*8B of streamed traffic.  Crossover measured
    #: on v5e: streaming wins while m*K*8B/787GB/s < ~90ns, i.e.
    #: m*K < ~8800; STREAM_ELEMS stays under it with margin.  Tiny m
    #: unrolls (XLA fuses the passes); the middle tier rides fori_loop
    #: to keep compile time flat.
    SMALL = 64
    STREAM_ELEMS = 6144

    def run_batch(groups, op):
        for dt, cols in groups.items():
            stackv = jnp.stack([v for _, v in cols], axis=1)
            if m <= SMALL:
                rows = []
                for s in range(m):
                    sel = (slot == s)[:, None]
                    if op == "add":
                        rows.append(jnp.where(
                            sel, stackv, jnp.zeros((), dt)).sum(axis=0))
                    elif op == "min":
                        rows.append(jnp.where(
                            sel, stackv, _neutral(dt, "min")).min(axis=0))
                    else:
                        rows.append(jnp.where(
                            sel, stackv, _neutral(dt, "max")).max(axis=0))
                tbl = jnp.stack(rows)
            elif m * len(cols) <= STREAM_ELEMS:
                if op == "add":
                    neutral = jnp.zeros((), dt)
                elif op == "min":
                    neutral = _neutral(dt, "min")
                else:
                    neutral = _neutral(dt, "max")

                def body(s, tbl):
                    sel = (slot == s)[:, None]
                    masked = jnp.where(sel, stackv, neutral)
                    if op == "add":
                        row = masked.sum(axis=0)
                    elif op == "min":
                        row = masked.min(axis=0)
                    else:
                        row = masked.max(axis=0)
                    return tbl.at[s].set(row)

                tbl = jax.lax.fori_loop(
                    0, m, body, jnp.full((m, len(cols)), neutral, dt))
            elif op == "add":
                tbl = jnp.zeros((m, len(cols)), dt
                                ).at[slot].add(stackv, mode="drop")
            elif op == "min":
                tbl = jnp.full((m, len(cols)), _neutral(dt, "min"), dt
                               ).at[slot].min(stackv, mode="drop")
            else:
                tbl = jnp.full((m, len(cols)), _neutral(dt, "max"), dt
                               ).at[slot].max(stackv, mode="drop")
            for k, (tag, _) in enumerate(cols):
                got[(op,) + tag] = tbl[:, k]

    # Pallas VMEM-histogram fast path (grouphist_pallas): one pass over
    # the data for every bound-safe sum column vs ~100ns/row per XLA
    # scatter pass; the planner proves the bounds and passes
    # pallas_seg = (seg, ntab, wide) where wide[j] marks acc columns
    # needing the hi/lo i32 split (scaled-int decimal sums)
    use_pallas = False
    if pallas_seg and not min_cols and not max_cols \
            and list(add_cols) == [_I64]:
        from liquid_tpu.ops import grouphist_pallas as gh
        if gh.HAVE_PALLAS:
            use_pallas = True
    if use_pallas:
        from liquid_tpu.ops import grouphist_pallas as gh
        seg, ntab, wide = pallas_seg
        parts = []       # (tag, "plain" | "hi" | "lo")
        stack_cols = []
        for tag, v in add_cols[_I64]:
            if tag[0] == "acc" and wide[tag[1]]:
                hi, lo = gh.split_hilo(v)
                stack_cols += [hi, lo]
                parts += [(tag, "hi"), (tag, "lo")]
            else:
                stack_cols.append(v.astype(jnp.int32))
                parts.append((tag, "plain"))
        stackv = jnp.stack(stack_cols, axis=1)
        tb = gh.group_accumulate(slot, stackv, m, seg, ntab)
        acc_map = {}
        for k2, (tag, part) in enumerate(parts):
            col = tb[:m, k2]
            if part == "hi":
                acc_map[tag] = col << gh.SPLIT
            elif part == "lo":
                acc_map[tag] = acc_map[tag] + col
            else:
                acc_map[tag] = col
        for tag, v in acc_map.items():
            got[("add",) + tag] = v
    else:
        run_batch(add_cols, "add")
        run_batch(min_cols, "min")
        run_batch(max_cols, "max")

    occ = got[("add", "occ", 0)] > 0
    if having:
        # device HAVING over one aggregate slot: groups failing the
        # predicate never reach the packed output (q18's inner
        # `HAVING sum(l_quantity) > 300` keeps ~60 of 1.5M groups --
        # without this every group crossed the ~8 MB/s tunnel)
        hj, hop, hlit = having
        hacc = got[("add", "acc", hj)].astype(jnp.float64)
        hcnt = got[("add", "cnt", hj)]
        hv = jnp.float64(hlit)
        ok = {"gt": hacc > hv, "ge": hacc >= hv, "lt": hacc < hv,
              "le": hacc <= hv, "eq": hacc == hv,
              "ne": hacc != hv}[hop]
        occ = occ & ok & (hcnt > 0)
    # keys decode from the slot INDEX (bijective): pure iota math,
    # no scatter passes
    iota = jnp.arange(m, dtype=jnp.int64)
    kreps, nreps = [], []
    for i in range(nk):
        idx = (iota // jnp.int64(strides[i])) % jnp.int64(spans[i] + 2)
        isnull = idx == jnp.int64(spans[i] + 1)
        kreps.append(jnp.where(isnull, jnp.int64(0), idx + los[i]))
        nreps.append(isnull)

    # pack by searchsorted-gather (see hash_rounds_reduce_packed: the
    # scatter-based prefix pack cost ~100ns per SLOT per column)
    pos = jnp.cumsum(occ.astype(jnp.int32))
    n_groups = pos[-1]
    kcat = tuple(kreps)
    ncat = tuple(nreps)
    ocat = tuple(got[("add" if kinds[j] == "sum" else kinds[j],
                      "acc", j)] for j in range(len(vals)))
    ccat = tuple(got[("add", "cnt", j)] for j in range(len(vals)))
    w = min(m, PACK_CAP)
    ukeys, uknulls, outs, vcounts = _pack_by_search(
        pos, kcat, ncat, ocat, ccat, w)
    mat = _pack_outputs(jnp.bool_(True), n_groups, ukeys, uknulls, outs,
                        vcounts, w)
    return (mat, jnp.bool_(True), n_groups,
            (occ,) + kcat + ncat + ocat + ccat)


@partial(jax.jit, static_argnames=("kinds", "n_slots", "salt", "rounds"))
def hash_rounds_reduce_packed(codes, knulls, valid, vals, vnulls, kinds,
                              n_slots, salt, rounds=3):
    """Multi-round collision-resolved grouped reduction with the packed
    single-fetch output of hash_group_reduce_packed.

    The single-shot table is clean only while distinct^2 << 2*slots
    (birthday bound) -- a 9k-cardinality GROUP BY defeats even 2^20
    slots.  Rounds fix that (same idea as the distributed session's
    hash_rounds_body): rows whose slot got two distinct key tuples
    re-scatter with a fresh salt next round, so the dirty population
    shrinks geometrically; each key tuple resolves in EXACTLY one round
    (all its rows share a slot).  `clean` False means `rounds` rounds
    did not converge: retry with a bigger table.
    """
    n = valid.shape[0]
    live = valid
    occs, kreps_r, nreps_r, outs_r, cnts_r = [], [], [], [], []
    for r in range(rounds):
        rsalt = (salt + r * 0x9E3779B97F4A7C15) % (1 << 64)
        h = jnp.full((n,), jnp.uint64(rsalt))
        for c, nl in zip(codes, knulls):
            h = _mix(h, c.astype(jnp.uint64))
            h = _mix(h, nl.astype(jnp.uint64))
        if not codes:
            h = jnp.zeros((n,), jnp.uint64)
        slot = (h & jnp.uint64(n_slots - 1)).astype(jnp.int32)
        slot = jnp.where(live, slot, n_slots)  # OOB -> dropped

        # scatter BATCHING: columns sharing (op, dtype) ride ONE 2D
        # scatter with a shared index vector -- the random-access cost
        # of a scatter is paid per PASS, not per column (null masks fold
        # into the payload: 0 for adds, the neutral for min/max)
        add_cols = {}   # dtype -> [(tag, values)]
        min_cols = {}   # dtype -> [(tag, values)]
        max_cols = {}
        for i, (c, nl) in enumerate(zip(codes, knulls)):
            min_cols.setdefault(c.dtype, []).append((("kmin", i), c))
            max_cols.setdefault(c.dtype, []).append((("kmax", i), c))
            valid_flag = (~nl).astype(jnp.int64)
            min_cols.setdefault(_I64, []).append(
                (("nmin", i), valid_flag))
            max_cols.setdefault(_I64, []).append(
                (("nmax", i), valid_flag))
        add_cols.setdefault(_I64, []).append(
            (("occ", 0), jnp.ones((n,), jnp.int64)))
        for j, (v, vn, kind) in enumerate(zip(vals, vnulls, kinds)):
            contrib = live & ~vn
            add_cols.setdefault(_I64, []).append(
                (("cnt", j), contrib.astype(jnp.int64)))
            if kind == "sum":
                z = jnp.where(contrib, v, jnp.zeros((), v.dtype))
                add_cols.setdefault(v.dtype, []).append((("acc", j), z))
            elif kind == "min":
                z = jnp.where(contrib, v, _neutral(v.dtype, "min"))
                min_cols.setdefault(v.dtype, []).append((("acc", j), z))
            else:
                z = jnp.where(contrib, v, _neutral(v.dtype, "max"))
                max_cols.setdefault(v.dtype, []).append((("acc", j), z))

        got = {}

        def run_batch(groups, op):
            for dt, cols in groups.items():
                stackv = jnp.stack([v for _, v in cols], axis=1)  # [n, K]
                if op == "add":
                    tbl = jnp.zeros((n_slots, len(cols)), dt
                                    ).at[slot].add(stackv, mode="drop")
                elif op == "min":
                    tbl = jnp.full((n_slots, len(cols)),
                                   _neutral(dt, "min"), dt
                                   ).at[slot].min(stackv, mode="drop")
                else:
                    tbl = jnp.full((n_slots, len(cols)),
                                   _neutral(dt, "max"), dt
                                   ).at[slot].max(stackv, mode="drop")
                for k, (tag, _) in enumerate(cols):
                    got[(op,) + tag] = tbl[:, k]

        run_batch(add_cols, "add")
        run_batch(min_cols, "min")
        run_batch(max_cols, "max")

        occ = got[("add", "occ", 0)] > 0
        dirty = jnp.zeros((n_slots,), jnp.bool_)
        kreps, nreps = [], []
        for i in range(len(codes)):
            cmin = got[("min", "kmin", i)]
            cmax = got[("max", "kmax", i)]
            nmin = got[("min", "nmin", i)]
            nmax = got[("max", "nmax", i)]
            dirty = dirty | (occ & ((cmin != cmax) | (nmin != nmax)))
            kreps.append(cmin)
            # nl valid-flag min==0 means some row was NULL; a clean slot
            # has nmin==nmax, so nmin==0 <-> the key is NULL there
            nreps.append(nmin == 0)
        clean_slot = occ & ~dirty
        occs.append(clean_slot)
        kreps_r.append(kreps)
        nreps_r.append(nreps)
        outs_k = []
        cnts_k = []
        for j, (v, vn, kind) in enumerate(zip(vals, vnulls, kinds)):
            op = "add" if kind == "sum" else kind
            outs_k.append(got[(op, "acc", j)])
            cnts_k.append(got[("add", "cnt", j)])
        outs_r.append(outs_k)
        cnts_r.append(cnts_k)
        live = live & dirty[jnp.clip(slot, 0, n_slots - 1)]

    clean = live.sum(dtype=jnp.int64) == 0
    # Concatenate rounds (free: no data movement beyond the concat) and
    # pack the leading PACK_CAP groups by SEARCHSORTED-GATHER.  The old
    # form scattered every output column into a prefix-packed [m] array
    # (m = rounds * n_slots): 16+ scatter passes of m indices each --
    # ~100ns/index on a TPU whether the slot is occupied or not, which
    # for a 4M-slot stage cost SECONDS per query.  A gather is 5x
    # cheaper per element and only w=65k of them are needed.
    m = rounds * n_slots
    nk = len(codes)
    occ_all = jnp.concatenate(occs)
    pos = jnp.cumsum(occ_all.astype(jnp.int32))
    n_groups = pos[-1]
    kcat = tuple(jnp.concatenate([kreps_r[r][i] for r in range(rounds)])
                 for i in range(nk))
    ncat = tuple(jnp.concatenate([nreps_r[r][i] for r in range(rounds)])
                 for i in range(nk))
    ocat = tuple(jnp.concatenate([outs_r[r][j] for r in range(rounds)])
                 for j in range(len(vals)))
    ccat = tuple(jnp.concatenate([cnts_r[r][j] for r in range(rounds)])
                 for j in range(len(vals)))
    w = min(m, PACK_CAP)
    ukeys, uknulls, outs, vcounts = _pack_by_search(
        pos, kcat, ncat, ocat, ccat, w)
    mat = _pack_outputs(clean, n_groups, ukeys, uknulls, outs, vcounts, w)
    # slot-ordered (unpacked) columns ride along for the g > PACK_CAP
    # re-fetch (repack_groups); they are already materialized, so
    # returning them costs nothing extra
    return (mat, clean, n_groups, (occ_all,) + kcat + ncat + ocat + ccat)


def _pack_by_search(pos, kcat, ncat, ocat, ccat, w: int):
    """Gather the first `w` occupied groups: src[j] = first slot whose
    inclusive occupancy cumsum reaches j+1 (binary search, no scatter)."""
    src = jnp.clip(
        jnp.searchsorted(pos, jnp.arange(1, w + 1, dtype=pos.dtype)),
        0, pos.shape[0] - 1)
    return (tuple(k[src] for k in kcat), tuple(n[src] for n in ncat),
            tuple(o[src] for o in ocat), tuple(c[src] for c in ccat))


@partial(jax.jit, static_argnames=("nk", "nv", "w"))
def repack_groups(cols, nk: int, nv: int, w: int):
    """Re-pack a reduction's slot-ordered outputs at a larger width
    (the caller learned n_groups > PACK_CAP from the header): cols is
    (occ, *ukeys[nk], *uknulls[nk], *outs[nv], *vcounts[nv])."""
    occ = cols[0]
    pos = jnp.cumsum(occ.astype(jnp.int32))
    kcat = cols[1:1 + nk]
    ncat = cols[1 + nk:1 + 2 * nk]
    ocat = cols[1 + 2 * nk:1 + 2 * nk + nv]
    ccat = cols[1 + 2 * nk + nv:]
    return _pack_by_search(pos, kcat, ncat, ocat, ccat, w)


def _pack_outputs(clean, ng, ukeys, uknulls, outs, vcounts, w):
    """Bit-pack every output into ONE int64 matrix for a single bounded
    device->host transfer (row 0 header [clean, n_groups, ...])."""
    hdr = jnp.zeros((w,), jnp.int64)
    hdr = hdr.at[0].set(clean.astype(jnp.int64))
    hdr = hdr.at[1].set(ng.astype(jnp.int64))

    def as_i64(x):
        if x.dtype == jnp.float64:
            x = floatbits.f64_bits(x)
        elif x.dtype != jnp.int64:
            x = x.astype(jnp.int64)
        return x[:w]

    rows = [hdr] + [as_i64(k) for k in ukeys] \
        + [as_i64(n) for n in uknulls] \
        + [as_i64(o) for o in outs] + [as_i64(c) for c in vcounts]
    return jnp.stack(rows)


@partial(jax.jit, static_argnames=("kinds", "n_slots", "salt"))
def hash_group_reduce_packed(codes, knulls, valid, vals, vnulls, kinds,
                             n_slots, salt):
    """hash_group_reduce with every output bit-packed into ONE int64
    matrix [1 + 2*nkeys + 2*nslots_out, min(n_slots, PACK_CAP)] so the
    host pays a single bounded device->host transfer (each fetch has a
    ~28ms floor through the axon tunnel, PERF_NOTES.md).  Groups are
    prefix-packed; row 0 is the header [clean, n_groups, 0...]; if
    n_groups exceeds the cap the caller re-fetches the full arrays.
    f64/u64 payload rows are bitcast and recovered host-side by dtype."""
    clean, ng, ukeys, uknulls, outs, vcounts = hash_group_reduce(
        codes, knulls, valid, vals, vnulls, kinds, n_slots, salt)
    w = min(n_slots, PACK_CAP)
    hdr = jnp.zeros((w,), jnp.int64)
    hdr = hdr.at[0].set(clean.astype(jnp.int64))
    hdr = hdr.at[1].set(ng.astype(jnp.int64))

    def as_i64(x):
        # no bitcast_convert_type: TPU's X64-rewrite pass can't compile
        # it on 64-bit operands (ops/floatbits.py).  u64 -> s64 convert
        # is modular two's-complement (bit-exact, verified on v5e);
        # f64 goes through the arithmetic IEEE-bit-image kernel.
        if x.dtype == jnp.float64:
            x = floatbits.f64_bits(x)
        elif x.dtype != jnp.int64:
            x = x.astype(jnp.int64)
        return x[:w]

    rows = [hdr] + [as_i64(k) for k in ukeys] \
        + [as_i64(n) for n in uknulls] \
        + [as_i64(o) for o in outs] + [as_i64(c) for c in vcounts]
    return (jnp.stack(rows), clean, ng, ukeys, uknulls, outs, vcounts)


@partial(jax.jit, static_argnames=("kinds", "n_slots", "salt"))
def hash_group_reduce(codes: Tuple[jax.Array, ...],
                      knulls: Tuple[jax.Array, ...],
                      valid: jax.Array,
                      vals: Tuple[jax.Array, ...],
                      vnulls: Tuple[jax.Array, ...],
                      kinds: Tuple[str, ...],
                      n_slots: int,
                      salt: int):
    """Grouped reduction by hashing; same contract as
    `groupby.group_reduce` plus a leading `clean` flag.

    Returns (clean, n_groups, ukeys, uknulls, outs, vcounts) where every
    per-group array has length `n_slots` with groups packed at
    [0, n_groups).  `clean` False means a hash collision merged two
    distinct key tuples somewhere: all other outputs are garbage and the
    caller MUST retry (different salt / bigger table) or use the sort
    path.  Invalid rows scatter out-of-bounds and are dropped.
    """
    n = valid.shape[0]
    h = jnp.full((n,), jnp.uint64(salt))
    for c, nl in zip(codes, knulls):
        h = _mix(h, c.astype(jnp.uint64))
        h = _mix(h, nl.astype(jnp.uint64))
    if not codes:
        h = jnp.zeros((n,), jnp.uint64)
    slot = (h & jnp.uint64(n_slots - 1)).astype(jnp.int32)
    slot = jnp.where(valid, slot, n_slots)  # OOB -> dropped

    occ = jnp.zeros((n_slots,), jnp.bool_).at[slot].set(True, mode="drop")

    # exact collision check: per-slot min/max of every key column's code
    # (and null flag) must agree
    clean = jnp.bool_(True)
    kreps = []
    nreps = []
    for c, nl in zip(codes, knulls):
        cmin = jnp.full((n_slots,), _neutral(c.dtype, "min"), c.dtype
                        ).at[slot].min(c, mode="drop")
        cmax = jnp.full((n_slots,), _neutral(c.dtype, "max"), c.dtype
                        ).at[slot].max(c, mode="drop")
        nl8 = nl.astype(jnp.int32)
        nmin = jnp.full((n_slots,), 2, jnp.int32).at[slot].min(nl8, mode="drop")
        nmax = jnp.full((n_slots,), -1, jnp.int32).at[slot].max(nl8, mode="drop")
        clean = clean & jnp.where(occ, (cmin == cmax) & (nmin == nmax),
                                  True).all()
        kreps.append(cmin)
        nreps.append(nmin == 1)

    # pack occupied slots to the prefix (keeps the group_reduce contract)
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
    n_groups = occ.sum(dtype=jnp.int32)
    dest = jnp.where(occ, pos, n_slots)
    ukeys = tuple(jnp.zeros((n_slots,), c.dtype).at[dest].set(r, mode="drop")
                  for c, r in zip(codes, kreps))
    uknulls = tuple(jnp.zeros((n_slots,), jnp.bool_)
                    .at[dest].set(r, mode="drop") for r in nreps)

    outs = []
    vcounts = []
    for v, vn, kind in zip(vals, vnulls, kinds):
        contrib = valid & ~vn
        cslot = jnp.where(contrib, slot, n_slots)
        cnt = jnp.zeros((n_slots,), jnp.int64).at[cslot].add(
            jnp.ones((n,), jnp.int64), mode="drop")
        if kind == "sum":
            acc = jnp.zeros((n_slots,), v.dtype).at[cslot].add(v, mode="drop")
        elif kind == "min":
            acc = jnp.full((n_slots,), _neutral(v.dtype, "min"), v.dtype
                           ).at[cslot].min(v, mode="drop")
        elif kind == "max":
            acc = jnp.full((n_slots,), _neutral(v.dtype, "max"), v.dtype
                           ).at[cslot].max(v, mode="drop")
        else:
            raise ValueError(f"kind {kind}")
        outs.append(jnp.zeros_like(acc).at[dest].set(acc, mode="drop"))
        vcounts.append(jnp.zeros_like(cnt).at[dest].set(cnt, mode="drop"))
    return clean, n_groups, ukeys, uknulls, tuple(outs), tuple(vcounts)
