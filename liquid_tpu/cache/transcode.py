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
