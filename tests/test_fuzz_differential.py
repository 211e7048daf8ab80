"""Differential fuzzing: encoded byte-view comparisons vs pyarrow kernels.

Mirrors the reference's libFuzzer target (liquid-cache
`fuzz/fuzz_targets/fsst_view.rs:1-117`): LiquidByteViewArray comparisons
(prefix keys -> fingerprints -> FSST needle compare) must agree with the
Arrow compute kernels on arbitrary strings, needles, and operators --
including NULLs, empty strings, non-ASCII, and shared prefixes.
Seeded here for CI; `fuzz/fuzz_byteview.py` runs the open-ended loop.
"""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from liquid_tpu.arrays.base import Predicate
from liquid_tpu.arrays.byteview import LiquidByteViewArray
from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
from liquid_tpu.ops import mask as mops

OPS = ["eq", "ne", "lt", "lt_eq", "gt", "gt_eq",
       "contains", "not_contains", "starts_with", "ends_with"]

_PC = {
    "eq": pc.equal, "ne": pc.not_equal, "lt": pc.less, "lt_eq": pc.less_equal,
    "gt": pc.greater, "gt_eq": pc.greater_equal,
    "contains": pc.match_substring,
    "not_contains": lambda a, n: pc.invert(pc.match_substring(a, n)),
    "starts_with": pc.starts_with, "ends_with": pc.ends_with,
}

ALPHABETS = [
    list("ab"),                          # heavy prefix sharing
    list("abcdefgh \t"),                 # small
    [chr(c) for c in range(33, 127)],    # printable ascii
    list("日本語中文한국어αβγ"),           # multi-byte utf-8
]


def random_strings(rng, n, max_len=24):
    alphabet = ALPHABETS[int(rng.integers(0, len(ALPHABETS)))]
    shared = "".join(rng.choice(alphabet, int(rng.integers(0, 9))))
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.05:
            out.append(None)
        elif r < 0.10:
            out.append("")
        else:
            ln = int(rng.integers(0, max_len))
            out.append(shared + "".join(rng.choice(alphabet, ln)))
    return out


def pick_needle(rng, values):
    present = [v for v in values if v]
    r = rng.random()
    if r < 0.4 and present:
        v = present[int(rng.integers(0, len(present)))]
        if rng.random() < 0.5 or len(v) < 2:
            return v  # exact value
        a = int(rng.integers(0, len(v)))
        b = int(rng.integers(a, len(v) + 1))
        return v[a:b]  # substring of a value
    alphabet = ALPHABETS[int(rng.integers(0, len(ALPHABETS)))]
    return "".join(rng.choice(alphabet, int(rng.integers(0, 8))))


def check_case(seed: int):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 2000))
    vals = random_strings(rng, n)
    arr = pa.array(vals, pa.string())
    liquid = LiquidByteViewArray.from_arrow(
        arr, with_fingerprints=bool(rng.random() < 0.5))
    for _ in range(4):
        op = OPS[int(rng.integers(0, len(OPS)))]
        needle = pick_needle(rng, vals)
        if not needle and op in ("contains", "not_contains"):
            continue  # empty needle: degenerate, DF rejects
        got = liquid.try_eval_predicate(Predicate(op, needle))
        assert got is not None, (seed, op, needle)
        gbits = np.asarray(mops.unpack_bits(got.bits))[:n]
        gvalid = np.asarray(mops.unpack_bits(got.valid))[:n]
        expect = _PC[op](arr, needle)
        evalid = np.asarray(pc.is_valid(expect))
        ebits = np.asarray(expect.fill_null(False))
        assert (gvalid == evalid).all(), \
            f"seed={seed} op={op} needle={needle!r}: validity diverged"
        m = evalid
        assert (gbits[m] == ebits[m]).all(), \
            f"seed={seed} op={op} needle={needle!r}: " \
            f"rows {np.flatnonzero(gbits[m] != ebits[m])[:5]}"


@pytest.mark.parametrize("seed", range(60))
def test_byteview_differential(seed):
    check_case(seed)


def check_primitive_case(seed: int):
    """Same differential for bit-plane integer comparisons."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3000))
    lo = int(rng.integers(-1_000_000, 1_000_000))
    span = int(rng.integers(1, 1 << int(rng.integers(1, 40))))
    vals = rng.integers(lo, lo + span, n)
    nulls = rng.random(n) < 0.1
    arr = pa.array(np.where(nulls, 0, vals), pa.int64())
    arr = pc.if_else(pa.array(~nulls), arr, pa.scalar(None, pa.int64()))
    liquid = LiquidPrimitiveArray.from_arrow(arr)
    pcs = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
           "lt_eq": pc.less_equal, "gt": pc.greater, "gt_eq": pc.greater_equal}
    for _ in range(4):
        op = list(pcs)[int(rng.integers(0, 6))]
        # literal: in-range, out-of-range, or exact value
        r = rng.random()
        if r < 0.5:
            lit = int(vals[int(rng.integers(0, n))])
        else:
            lit = int(rng.integers(lo - span, lo + 2 * span))
        got = liquid.try_eval_predicate(Predicate(op, lit))
        assert got is not None
        gbits = np.asarray(mops.unpack_bits(got.bits))[:n]
        gvalid = np.asarray(mops.unpack_bits(got.valid))[:n]
        expect = pcs[op](arr, lit)
        evalid = np.asarray(pc.is_valid(expect))
        ebits = np.asarray(expect.fill_null(False))
        assert (gvalid == evalid).all(), (seed, op, lit)
        m = evalid
        assert (gbits[m] == ebits[m]).all(), (seed, op, lit)


@pytest.mark.parametrize("seed", range(40))
def test_primitive_differential(seed):
    check_primitive_case(seed)
