"""Arrow -> Liquid transcoding dispatch.

Reference behavior: the transcoder (liquid-cache
`src/core/src/cache/transcode.rs:38-...`): per-type dispatch of arrow
arrays into liquid encodings; trains a shared FSST compressor on the
first string batch per column; a substring hint triggers fingerprint
builds.  Ours dispatches to the bit-plane / dictionary / ALP encoders;
the per-column state (shared dictionaries, hint votes) lives in
`ColumnStates`.
"""
from __future__ import annotations

from typing import Optional

import pyarrow as pa

from liquid_tpu.arrays import byteview, decimal as dec, float_alp, primitive
from liquid_tpu.arrays.base import LiquidArray
from liquid_tpu.cache.expressions import ExtractDate32, SubstringSearch


def _try_linear(arr: pa.Array):
    """Adaptive encoding choice: near-monotonic integer columns (row ids,
    timestamps, offsets) fit a line whose residuals pack several bits
    narrower than the plain offsets (ref design/02-linear-integer.md);
    pick LiquidLinearArray when the estimated saving is >= 3 bits."""
    import numpy as np
    from liquid_tpu.arrays import linear
    from liquid_tpu.ops import bitpack as bp
    n = len(arr)
    if n < 1024 or arr.null_count * 4 > n:
        return None
    vals = np.asarray(arr.fill_null(0)if arr.null_count else arr)
    vals = vals.astype(np.int64, copy=False)
    # range in Python ints: int64 columns spanning > 2^63 (e.g. hash ids)
    # would wrap under numpy scalar subtraction
    plain_width = bp.bit_width_for(int(vals.max()) - int(vals.min()))
    if plain_width < 10:
        return None
    idx = np.arange(n, dtype=np.float64)
    vf = vals.astype(np.float64)
    denom = ((idx - idx.mean()) ** 2).sum()
    if denom <= 0:
        return None
    slope = ((idx - idx.mean()) * (vf - vf.mean())).sum() / denom
    resid = vals - np.round(slope * idx).astype(np.int64)
    resid_width = bp.bit_width_for(int(resid.max()) - int(resid.min()))
    if resid_width + 3 > plain_width:
        return None
    return linear.LiquidLinearArray.from_arrow(arr)


def transcode(arr: pa.Array, hint=None, compressor=None) -> Optional[LiquidArray]:
    """-> LiquidArray, or None if the type has no liquid encoding yet
    (caller keeps the arrow form; ref transcode.rs fallthrough).

    `compressor` is the column's shared FSST compressor; when None a new
    one is trained on this batch's dictionary (ref
    with_fsst_compressor_or_train, transcode.rs:16-33).
    """
    t = arr.type
    if pa.types.is_boolean(t):
        # store as 1-bit primitive; logical type preserved through cast
        return primitive.LiquidPrimitiveArray.from_arrow(arr.cast(pa.uint8()))._with_logical(t)
    if primitive.is_supported_type(t):
        lin = _try_linear(arr)
        if lin is not None:
            return lin
        return primitive.LiquidPrimitiveArray.from_arrow(arr)
    if float_alp.is_supported_type(t):
        return float_alp.LiquidFloatArray.from_arrow(arr)
    if dec.is_supported_type(t):
        # small decimals -> bit-planes; big ones -> dict + FSST bytes
        # (ref transcode.rs decimal dispatch -> decimal_array.rs /
        #  fix_len_byte_array.rs)
        if dec.LiquidDecimalArray.fits(arr):
            return dec.LiquidDecimalArray.from_arrow(arr)
        return dec.LiquidFixedLenByteArray.from_arrow(arr, compressor=compressor)
    if byteview.is_supported_type(t):
        return byteview.LiquidByteViewArray.from_arrow(
            arr, with_fingerprints=isinstance(hint, SubstringSearch),
            compressor=compressor)
    return None
