"""Cache-aware expression hints.

Reference behavior: `CacheExpression` (liquid-cache
`src/core/src/cache/expressions.rs:38-53`): hints flowing from the
planner into the cache about how a column is consumed --
`ExtractDate32{field}` (only a date component is needed),
`SubstringSearch` (column is LIKE '%x%'-only, build fingerprints),
`PredicateColumn` (column is filtered, prefer encoded predicate eval).
Hints drive squeeze decisions (squeeze date32 to its component; keep
fingerprints resident) and are recorded per column with a majority vote
(ref ParquetCacheMetadata, io/mod.rs:12-56).
"""
from __future__ import annotations

from collections import Counter, deque
from dataclasses import dataclass
from typing import Optional

from liquid_tpu.utils.dates import FIELDS


@dataclass(frozen=True)
class ExtractDate32:
    field: str  # year | month | day | dow

    def __post_init__(self):
        assert self.field in FIELDS, self.field


@dataclass(frozen=True)
class SubstringSearch:
    pass


@dataclass(frozen=True)
class PredicateColumn:
    pass


@dataclass(frozen=True)
class VariantGet:
    """Column is consumed only through `variant_get(col, path [, type])`:
    squeeze shreds the requested (path, type) pairs into typed resident
    arrays (ref `CacheExpression::VariantGet` + `VariantRequest`,
    expressions.rs:38-53, and try_variant_squeeze, squeeze.rs:222-290)."""

    requests: tuple  # of (path: str, type: str)

    def __post_init__(self):
        from liquid_tpu.arrays.variant import PATH_TYPES
        for _p, t in self.requests:
            assert t in PATH_TYPES, t

    def merged(self, other: "VariantGet") -> "VariantGet":
        want = dict.fromkeys(self.requests)
        want.update(dict.fromkeys(other.requests))
        return VariantGet(tuple(want))


CacheExpression = object  # union tag for docs; isinstance checks in core


def parse_hint(s: str) -> Optional[object]:
    """Parse a metadata-string hint (ref expressions.rs:120-130)."""
    if s.startswith("extract_date32:"):
        return ExtractDate32(s.split(":", 1)[1])
    if s == "substring_search":
        return SubstringSearch()
    if s == "predicate_column":
        return PredicateColumn()
    if s.startswith("variant_get:"):
        reqs = []
        for part in s.split(":", 1)[1].split(","):
            path, _, t = part.partition("@")
            reqs.append((path, t or "variant"))
        return VariantGet(tuple(reqs))
    return None


class HintVote:
    """Majority vote over a bounded history of hints per column
    (ref io/mod.rs per-column 16-entry history)."""

    def __init__(self, window: int = 16):
        self._hist: deque = deque(maxlen=window)

    def record(self, hint) -> None:
        self._hist.append(hint)

    def majority(self):
        if not self._hist:
            return None
        [(hint, _n)] = Counter(self._hist).most_common(1)
        if isinstance(hint, VariantGet):
            # variant hints accumulate: the squeeze should keep the union
            # of every path any query asked for (ref hydration.rs:147-160
            # merging newly-requested variant paths)
            for h in self._hist:
                if isinstance(h, VariantGet):
                    hint = hint.merged(h)
        return hint
