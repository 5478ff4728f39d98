"""BSON → canonical-type coercions for the MongoDB source shape.

Mirrors the reference's two conversion paths
(/root/reference/sources/mongodb/helpers.py:552-618):

- ``convert_bson_value`` — the Python-document loader path: ObjectId and
  Decimal128 render as strings (ObjectId's hex form), Regex collapses to
  its pattern, BSON Timestamp becomes its tz-aware datetime, and naive
  datetimes are pinned to UTC (Mongo stores UTC; a naive value is a
  driver artifact, and the engine-wide session contract is UTC).
- ``convert_arrow_bson_columns`` — the Arrow loader path: pymongoarrow
  encodes ObjectId as ``fixed_size_binary[12]`` (hex-stringified here,
  matching ``str(ObjectId)``), Decimal128 as arrow ``decimal128``
  (stringified to match the Python path), other fixed-size binaries
  widen to plain ``binary``, and naive timestamps gain UTC.

BSON classes are detected by TYPE NAME, not isinstance: the ``bson``
package stays an optional dependency (it is not in this engine's
baseline), any object with the right name + API coerces (pymongo's,
mongomock's, a test double), and everything unrecognized passes through
untouched.
"""

from __future__ import annotations

import datetime as _dt


def _as_utc(value: _dt.datetime) -> _dt.datetime:
    if value.tzinfo is None:
        return value.replace(tzinfo=_dt.timezone.utc)
    return value.astimezone(_dt.timezone.utc)


def convert_bson_value(value):
    """Coerce one BSON-decoded Python value (recursing into documents and
    arrays) to the canonical relational types."""
    name = type(value).__name__
    if name in ("ObjectId", "Decimal128"):
        return str(value)
    if name == "Regex":
        return value.try_compile().pattern
    if name == "Timestamp" and hasattr(value, "as_datetime"):
        # attribute-guarded: pandas.Timestamp shares the NAME but is a
        # datetime subclass — the isinstance branch below coerces it
        return _as_utc(value.as_datetime())
    if isinstance(value, _dt.datetime):
        return _as_utc(value)
    if isinstance(value, dict):
        return {k: convert_bson_value(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [convert_bson_value(v) for v in value]
    return value


def convert_bson_documents(docs):
    """Coerce an iterable of BSON-decoded documents (the Python loader's
    unit of work)."""
    return [convert_bson_value(d) for d in docs]


def convert_arrow_bson_columns(table):
    """Coerce a pyarrow Table's BSON-flavored columns in place (returns
    the new table).

    The ObjectId hex loop is per-value by necessity (the reference notes
    the same: a 12-byte binary → ASCII hex has no vectorized arrow
    kernel) but runs per Arrow batch on executors when used inside the
    ``batched_collection_scan`` path — never a driver-side row loop.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    for i, field in enumerate(table.schema):
        t = field.type
        new_field = None
        new_array = None
        if pa.types.is_fixed_size_binary(t) and t.byte_width == 12:
            # pymongoarrow's ObjectId encoding → str(ObjectId) hex form
            vals = [
                None if v is None else v.hex()
                for v in table.column(i).to_pylist()
            ]
            new_field = pa.field(field.name, pa.string())
            new_array = pa.array(vals, type=pa.string())
        elif pa.types.is_decimal(t):
            new_field = pa.field(field.name, pa.string())
            new_array = pc.cast(table.column(i), pa.string())
        elif pa.types.is_fixed_size_binary(t):
            new_field = pa.field(field.name, pa.binary())
            new_array = pc.cast(table.column(i), pa.binary())
        elif pa.types.is_timestamp(t) and t.tz is None:
            new_field = pa.field(field.name, pa.timestamp(t.unit, tz="UTC"))
            new_array = pc.assume_timezone(table.column(i), "UTC")
        if new_field is not None:
            table = table.set_column(i, new_field, new_array)
    return table
