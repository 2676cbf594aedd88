"""DECIMAL column support — exact fixed-point over decimal128 parquet.

Reference analog: ``type::TypeId::DECIMAL`` (src/include/type/type_id.h:
23-39) and its fixed-point execution semantics.  The engine's internal
recipe for exact money math is integer scaling (see scaled_int /
unscale in ops/relational.py); this module closes the gap for USER data
that already arrives as decimal128(p, s) parquet columns:

- ``mode="scaled"`` (default): each decimal128(p, s) column is converted
  AT THE SCAN EDGE to its exact unscaled int64 value (value × 10^s) via
  two exact Arrow kernels (decimal multiply by 10^s, then int64 cast) —
  zero Python per row.  Downstream sums/mins/counts over the int64s are
  exact in any accumulation order (the whole point of decimal), and one
  final division by 10^s yields the same double every engine produces
  from the exact decimal result.  Columns whose unscaled values could
  overflow int64 (precision > 18) are rejected loudly rather than
  silently truncated.
- ``mode="float"``: cast to float64 (lossy past 2^53) — fine for
  filters, ratios, and anything already leaving exact-decimal land.

The scan returns (dataset, scales) so callers can unscale at output.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

#: int64 holds any decimal with precision <= 18 unscaled
_MAX_INT64_PRECISION = 18


def decimal_scales(schema: pa.Schema) -> dict[str, int]:
    """{column: scale} for every decimal128/decimal256 column in schema."""
    out: dict[str, int] = {}
    for f in schema:
        if pa.types.is_decimal(f.type):
            out[f.name] = f.type.scale
    return out


def _convert_batch(batch: pa.Table, scales: dict[str, int], mode: str) -> pa.Table:
    for name, scale in scales.items():
        i = batch.column_names.index(name)
        col = batch.column(i)
        if mode == "float":
            batch = batch.set_column(i, name, pc.cast(col, pa.float64()))
            continue
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # exact: decimal multiply by 10^scale, then a lossless int cast
        # (scale is now 0 and precision <= 18 fits int64)
        mul = pa.scalar(10**scale, pa.decimal128(scale + 1, 0))
        batch = batch.set_column(
            i, name, pc.cast(pc.multiply(col, mul), pa.int64())
        )
    return batch


def strip_decimals(ds, mode: str = "scaled"):
    """Convert every decimal column of ``ds`` per ``mode``.

    Returns ``(dataset, scales)`` where scales maps each converted column
    to its original decimal scale (for unscaling at output).  Raises on
    precision > 18 in scaled mode — those need decimal256/bignum handling
    the engine does not promise."""
    schema = ds.schema().base_schema
    scales = decimal_scales(schema)
    if not scales:
        return ds, scales
    if mode == "scaled":
        for f in schema:
            if f.name in scales and f.type.precision > _MAX_INT64_PRECISION:
                raise ValueError(
                    f"decimal column {f.name!r} precision {f.type.precision} "
                    f"> {_MAX_INT64_PRECISION}: unscaled value may overflow "
                    "int64; read with mode='float' or pre-rescale"
                )
    converted = ds.map_batches(
        lambda b: _convert_batch(b, scales, mode),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return converted, scales


def read_decimal_table(
    path: str,
    columns: Sequence[str] | None = None,
    mode: str = "scaled",
    filter=None,
):
    """SeqScan over parquet that may carry decimal128 columns.

    Column-pruned, predicate-pushed read (same block sizing as
    read_table), with every decimal column normalized per ``mode`` at the
    scan edge.  Returns ``(dataset, scales)``."""
    import ray.data as rd

    from terrier_ray.ops.relational import _read_blocks_for
    from terrier_ray.sources.io import hashable_schema

    ds = rd.read_parquet(
        path,
        columns=list(columns) if columns else None,
        filter=filter,
        override_num_blocks=_read_blocks_for(path),
        schema=hashable_schema(path, columns),
    )
    return strip_decimals(ds, mode)
