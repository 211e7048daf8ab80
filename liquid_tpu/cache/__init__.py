"""Cache runtime (ref: liquid-cache src/core/src/cache/)."""
from liquid_tpu.cache.core import (  # noqa: F401
    DISK_ARROW, DISK_LIQUID, MEMORY_ARROW, MEMORY_LIQUID, MEMORY_SQUEEZED,
    LiquidCache, LiquidCacheBuilder,
)
from liquid_tpu.cache.policies import (  # noqa: F401
    AlwaysHydrate, Evict, FifoPolicy, LiquidPolicy, LruPolicy, NoHydration,
    TranscodeEvict, TranscodeSqueezeEvict,
)
from liquid_tpu.cache.expressions import (  # noqa: F401
    ExtractDate32, PredicateColumn, SubstringSearch, VariantGet,
)
