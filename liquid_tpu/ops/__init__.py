"""TPU kernels (XLA + Pallas) for the liquid-tpu hot paths.

These are the equivalents of the reference's Rust hot kernels
(fastlanes bit-packing, FSST compare paths, boolean_buffer_and_then,
filter/gather) re-designed for the TPU vector unit: everything operates
on packed uint32 lanes where one 32-bit word carries 32 rows.
"""
