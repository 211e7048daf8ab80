"""Benchmark harness: manifest-driven suites with answer verification.

Ref: liquid-cache `benchmark/` (clickbench_client, tpch_client,
tpcds_client, in_process runner, JSON manifests).
"""
