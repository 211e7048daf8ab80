"""Disaggregated mode: cache server + compute client.

Ref: liquid-cache `src/datafusion-server/` (Flight SQL service + admin
HTTP server) and `src/datafusion-client/` (pushdown client).
"""
from liquid_tpu.server.flight import (  # noqa: F401
    LiquidCacheService, LiquidCacheServiceInner,
)
from liquid_tpu.server.client import (  # noqa: F401
    FlightStreamMetrics, LiquidCacheClient, LiquidCacheClientBuilder,
)
from liquid_tpu.server.admin import AdminServer  # noqa: F401
