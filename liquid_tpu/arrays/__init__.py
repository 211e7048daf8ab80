"""Liquid encodings: cache-optimized column formats.

Ref: liquid-cache `src/core/src/liquid_array/` (LiquidArray trait and
per-type arrays).  See base.py for the trait mapping.
"""
from liquid_tpu.arrays.base import (  # noqa: F401
    BLOCK_ROWS, CMP_OPS, LiquidArray, LiquidSqueezedArray, Predicate,
)
from liquid_tpu.arrays.primitive import LiquidPrimitiveArray  # noqa: F401
from liquid_tpu.arrays.byteview import LiquidByteViewArray  # noqa: F401
from liquid_tpu.arrays.float_alp import LiquidFloatArray  # noqa: F401
from liquid_tpu.arrays.decimal import (  # noqa: F401
    LiquidDecimalArray, LiquidFixedLenByteArray,
)
from liquid_tpu.arrays.linear import (  # noqa: F401
    LiquidLinearArray, LiquidPrimitiveDeltaArray,
)
from liquid_tpu.arrays import ipc  # noqa: F401
from liquid_tpu.arrays.hybrid import (  # noqa: F401
    SqueezedByteViewArray, SqueezedDate32Array, SqueezedPrimitiveArray,
)
from liquid_tpu.arrays.variant import (  # noqa: F401
    VariantStructSqueezedArray, shred_variant,
)
