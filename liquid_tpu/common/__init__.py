"""Shared RPC types + test object store.

Ref: liquid-cache `src/common/` (rpc.rs, mock_store.rs, utils.rs).
"""
from liquid_tpu.common.rpc import (  # noqa: F401
    ExecutionMetricsResponse, FetchResults, PrefetchRequest,
    RegisterObjectStoreRequest, RegisterPlanRequest, read_msg, write_msg,
)
from liquid_tpu.common.object_store import (  # noqa: F401
    ByteCache, LocalStore, MockStore, ObjectStore, StoreFile, sanitize_url,
)
