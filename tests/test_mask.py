"""Selection-mask algebra tests (ref: utils.rs boolean_buffer_and_then tests)."""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_tpu.ops import mask as m


def _rand_bools(n, p, seed):
    rng = np.random.default_rng(seed)
    return rng.random(n) < p


@pytest.mark.parametrize("n", [32, 256, 8192])
@pytest.mark.parametrize("p", [0.0, 0.3, 1.0])
def test_pack_unpack_roundtrip(n, p):
    b = _rand_bools(n, p, 7)
    packed = m.pack_bools(jnp.asarray(b))
    back = np.asarray(m.unpack_bits(packed))
    np.testing.assert_array_equal(back, b)


def test_count_and_tail():
    b = _rand_bools(8192, 0.5, 1)
    packed = m.pack_bools(jnp.asarray(b))
    assert int(m.count(packed)) == b.sum()
    tm = m.tail_mask(100, 8192)
    assert int(m.count(packed & tm)) == b[:100].sum()
    assert int(m.count(m.all_set(8192))) == 8192
    assert int(m.count(m.all_set(8192, 5000))) == 5000
    assert int(m.count(m.none_set(8192))) == 0


def test_and_then_matches_reference_semantics():
    # selection over N rows; filtered over the selected rows only
    rng = np.random.default_rng(3)
    n = 8192
    sel = rng.random(n) < 0.4
    k = sel.sum()
    filt_sel = rng.random(k) < 0.5
    # reference semantics: keep selected row i iff filt_sel[rank(i)]
    expected = np.zeros(n, dtype=bool)
    expected[np.flatnonzero(sel)[filt_sel]] = True

    filt_padded = np.zeros(n, dtype=bool)
    filt_padded[:k] = filt_sel
    out = m.and_then(m.pack_bools(jnp.asarray(sel)), m.pack_bools(jnp.asarray(filt_padded)))
    np.testing.assert_array_equal(np.asarray(m.unpack_bits(out)), expected)


def test_compact_indices():
    rng = np.random.default_rng(5)
    n = 8192
    sel = rng.random(n) < 0.2
    idx, k = m.compact_indices(m.pack_bools(jnp.asarray(sel)), n)
    assert int(k) == sel.sum()
    np.testing.assert_array_equal(np.asarray(idx)[: int(k)], np.flatnonzero(sel))


def test_compact_indices_empty_and_full():
    n = 256
    idx, k = m.compact_indices(m.none_set(n), n)
    assert int(k) == 0
    idx, k = m.compact_indices(m.all_set(n), n)
    assert int(k) == n
    np.testing.assert_array_equal(np.asarray(idx), np.arange(n))


def test_kleene_or():
    #   a: T F N ;  b cycles T F N  -> arrow or_kleene truth table
    vals = [(True, True), (False, True), (False, False)]  # (bit, valid)
    import itertools
    a_bits, a_valid, b_bits, b_valid, e_bits, e_valid = [], [], [], [], [], []
    for (ab, av), (bb, bv) in itertools.product(vals, vals):
        a_bits.append(ab); a_valid.append(av); b_bits.append(bb); b_valid.append(bv)
        # Kleene OR
        if (ab and av) or (bb and bv):
            e_bits.append(True); e_valid.append(True)
        elif av and bv:  # both false
            e_bits.append(False); e_valid.append(True)
        else:
            e_bits.append(False); e_valid.append(False)
    pad = 32 - len(a_bits)
    for lst in (a_bits, a_valid, b_bits, b_valid, e_bits, e_valid):
        lst.extend([False] * pad)
    a = m.BoolMask.from_bools(jnp.asarray(a_bits), jnp.asarray(a_valid))
    b = m.BoolMask.from_bools(jnp.asarray(b_bits), jnp.asarray(b_valid))
    out = a.or_kleene(b)
    np.testing.assert_array_equal(
        np.asarray(m.unpack_bits(out.to_selection())),
        np.asarray(e_bits) & np.asarray(e_valid),
    )
    np.testing.assert_array_equal(np.asarray(m.unpack_bits(out.valid)), e_valid)


def test_kleene_and():
    # false AND null = false ; true AND null = null
    a = m.BoolMask.from_bools(
        jnp.asarray([False, True] + [False] * 30),
        jnp.asarray([True, True] + [False] * 30),
    )
    b = m.BoolMask.from_bools(
        jnp.asarray([False] * 32), jnp.asarray([False] * 32)
    )  # null, null
    out = a.and_kleene(b)
    bits = np.asarray(m.unpack_bits(out.valid))
    assert bits[0]        # false AND null = false (valid)
    assert not bits[1]    # true AND null = null
