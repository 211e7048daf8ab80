"""The micro-benchmark registry runs and reports sane numbers.

Mirrors the reference's CI, which compiles its 14 divan benches
(src/core/Cargo.toml:60-130); here we additionally execute each in tiny
mode and sanity-check the reported metrics.
"""
import math

from liquid_tpu.bench import micro


def test_registry_matches_reference_bench_set():
    expected = {
        "bitpacking", "primitive_encoding", "linear_integer", "fsst_view",
        "byte_view_compare", "fsst_selectivity", "string_fingerprint",
        "squeeze_date32", "cache_storage", "eviction", "filter_pushdown",
        "boolean_and_then", "filter_selectivity_ambiguity",
        "prefix_differentiability",
    }
    assert set(micro.REGISTRY) == expected


def test_all_benches_run_tiny():
    results = micro.run_all(tiny=True)
    assert len(results) == 14
    for r in results:
        assert {"name", "value", "unit"} <= set(r), r
        assert math.isfinite(r["value"]), r
        assert r["value"] >= 0, r


def test_compression_benches_actually_compress():
    fsst = micro.REGISTRY["fsst_view"](True)
    assert fsst["ratio"] < 1.0  # FSST shrinks the word corpus
    prim = micro.REGISTRY["primitive_encoding"](True)
    assert prim["ratio"] < 1.0  # 10-bit values packed below 4B/row


def test_eviction_bench_exercises_pressure_path():
    r = micro.REGISTRY["eviction"](True)
    assert r["squeezes"] + r["disk_evictions"] > 0


def test_prefix_studies_report_fractions():
    amb = micro.REGISTRY["filter_selectivity_ambiguity"](True)
    assert 0.0 <= amb["value"] <= 1.0
    diff = micro.REGISTRY["prefix_differentiability"](True)
    assert 0.0 <= diff["value"] <= 1.0
    # random words over a 13-char alphabet: most prefixes differ (short
    # 3-char words do tie, so this is well below 1.0 but well above 0)
    assert diff["value"] > 0.5
