"""StackOverflow-DBA-style suite: dual-path self-check under a tight
memory cap + pandas oracles for representative queries.

Mirrors the reference's StackOverflow suites
(liquid-cache `benchmark/stackoverflow/manifest.dba.json`, run in CI at
a 10MB memory cap to force the eviction paths, ci.yml:139-320).
"""
import numpy as np
import pandas as pd
import pytest

from liquid_tpu.bench import stackoverflow_data as so


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("so")
    tables = so.generate()
    paths = so.write_parquet(tables, str(d))
    return d, tables, paths


def _session(d, paths, cap_bytes, arrow_mode=False):
    from liquid_tpu.cache.policies import Evict
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    b = (LiquidCacheLocalBuilder()
         .with_max_memory_bytes(cap_bytes)
         .with_cache_dir(str(d)))
    if arrow_mode:
        b = b.with_transcode_on_insert(False).with_squeeze_policy(Evict())
    sess, cache = b.build()
    for n, p in paths.items():
        sess.register_parquet(n, p)
    return sess, cache


@pytest.mark.parametrize("qi", range(len(so.QUERIES)))
def test_dual_path_at_10mb(data, qi):
    """Encoded-pushdown mode vs arrow-fallback mode must agree bit-exact
    at the reference CI's 10MB cap."""
    d, tables, paths = data
    liquid, _ = _session(d, paths, 10 << 20)
    arrow, _ = _session(d, paths, 10 << 20, arrow_mode=True)
    a = liquid.sql(so.QUERIES[qi]).to_arrow()
    b = arrow.sql(so.QUERIES[qi]).to_arrow()
    assert a.equals(b.rename_columns(a.column_names)), f"q{qi} diverged"


def test_oracle_top_answerers(data):
    d, tables, paths = data
    sess, _ = _session(d, paths, 10 << 20)
    out = sess.sql(so.QUERIES[0]).to_arrow().to_pandas()
    posts = tables["posts"].to_pandas()
    users = tables["users"].to_pandas()
    j = posts[posts.p_post_type == 2].merge(
        users, left_on="p_owner_user_id", right_on="u_id")
    ref = (j.groupby("u_display_name")
           .agg(answers=("p_id", "size"), score=("p_score", "sum"))
           .reset_index()
           .sort_values(["score", "u_display_name"],
                        ascending=[False, True]).head(20))
    assert list(out.iloc[:, 0]) == list(ref.u_display_name)
    assert list(out.answers) == list(ref.answers)
    assert list(out.score) == list(ref.score)


def test_oracle_tag_like(data):
    d, tables, paths = data
    sess, _ = _session(d, paths, 10 << 20)
    out = sess.sql(so.QUERIES[1]).to_arrow()
    posts = tables["posts"].to_pandas()
    ref = ((posts.p_tags.str.contains("postgresql"))
           & (posts.p_score > 2)).sum()
    assert out.column("c")[0].as_py() == int(ref)


def test_oracle_unanswered(data):
    d, tables, paths = data
    sess, _ = _session(d, paths, 10 << 20)
    out = sess.sql(so.QUERIES[2]).to_arrow()
    posts = tables["posts"].to_pandas()
    answered = set(posts[posts.p_post_type == 2].p_parent_id)
    ref = ((posts.p_post_type == 1)
           & ~posts.p_id.isin(answered)).sum()
    assert out.column("c")[0].as_py() == int(ref)


def test_eviction_engaged_at_cap(data):
    """The 10MB cap must actually exercise squeeze/evict on this dataset
    (like the reference's CI cap choice)."""
    d, tables, paths = data
    sess, cache = _session(d, paths, 256 << 10)
    for q in so.QUERIES[:4]:
        sess.sql(q)
    st = cache.stats()
    assert st["squeezes"] + st["disk_writes"] > 0, st
    assert st["memory_used"] <= 256 << 10
