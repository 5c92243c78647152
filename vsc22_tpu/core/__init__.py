"""Core host-side types, storage and metrics (no device code).

These are the "currency" types of the framework — every pipeline stage above
speaks in terms of them. Interop contract: the npz feature format and the CSV
candidate/match schemas are byte-compatible with the reference
(`/root/reference` D1/infer/vsc/{storage,metrics}.py) so outputs can be
cross-checked bit-for-bit.
"""
