"""Error-payload type descriptors for the rule algebra.

The reference (``/root/reference/int/Data/Valor/Internal.hs:103-104``) carries
an error payload ``e`` in BOTH constructors of ``Wrong e`` — the payload is
always materialized, and combinators combine payloads via the payload type's
``Semigroup`` instance (Internal.hs:112-116).  In our engine a rule result is
a Spark ``struct<wrong:boolean, err:E>`` column; an :class:`ErrType` describes
``E``: its Spark type, its neutral (``mempty``) value, its ``<>`` (combine),
and how to lift a Python literal into it.

Supported payload shapes (mirroring what the reference exercises):

* ``EString``  — Haskell ``String`` (``<>`` = concatenation)
* ``EArray``   — ``[err]`` lists (``<>`` = ordered concat, duplicates kept —
  Internal.hs semantics require order/multiplicity preservation, so we use
  ``F.concat``, never ``array_union``)
* ``ENullable``— ``Maybe e`` (``Nothing`` neutral, ``Just a <> Just b =
  Just (a <> b)``) — introduced by ``peer``/``check1``
* ``ERecord``  — error records (field-wise combine; fields are nullable)
* ``EArrayOf`` — ``[Maybe e]`` per-element payloads from ``checkN``
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

WRONG = "wrong"
ERR = "err"


class ErrType:
    """Descriptor for the error payload type ``E``."""

    dtype: T.DataType

    def neutral(self) -> Column:
        """The Monoid identity (``mempty``) as a Column."""
        raise NotImplementedError

    def combine(self, a: Column, b: Column) -> Column:
        """Left-to-right Semigroup ``a <> b`` as a Column expression."""
        raise NotImplementedError

    def lit(self, value: Any) -> Column:
        """Lift a Python literal into a Column of this type."""
        raise NotImplementedError

    # -- helpers -----------------------------------------------------------
    def cast(self, col: Column) -> Column:
        return col.cast(self.dtype)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, ErrType) and self.dtype == other.dtype

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.dtype.simpleString()})"


class EString(ErrType):
    """Haskell ``String`` payload: ``<>`` is string concatenation."""

    def __init__(self) -> None:
        self.dtype = T.StringType()

    def neutral(self) -> Column:
        return F.lit("")

    def combine(self, a: Column, b: Column) -> Column:
        return F.concat(a, b)

    def lit(self, value: Any) -> Column:
        return F.lit(str(value))


class EArray(ErrType):
    """List payload ``[e]``: ordered concat, duplicates preserved."""

    def __init__(self, element: T.DataType | str = "string") -> None:
        if isinstance(element, str):
            element = getattr(T, "StringType")() if element == "string" else T._parse_datatype_string(element)
        self.element = element
        self.dtype = T.ArrayType(element, True)

    def neutral(self) -> Column:
        return F.array().cast(self.dtype)

    def combine(self, a: Column, b: Column) -> Column:
        # coalesce: a null operand behaves as the other side (defensive —
        # well-formed rules never produce null list payloads)
        return F.coalesce(F.concat(a, b), a, b)

    def lit(self, value: Any) -> Column:
        if isinstance(value, (list, tuple)):
            if not value:
                return self.neutral()
            return F.array(*[F.lit(v) for v in value]).cast(self.dtype)
        return F.array(F.lit(value)).cast(self.dtype)


class ENullable(ErrType):
    """``Maybe e``: ``Nothing`` is neutral; ``Just a <> Just b = Just (a<>b)``."""

    def __init__(self, inner: ErrType) -> None:
        self.inner = inner
        self.dtype = inner.dtype  # Spark types are nullable by default

    def neutral(self) -> Column:
        return F.lit(None).cast(self.dtype)

    def combine(self, a: Column, b: Column) -> Column:
        return (
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(self.inner.combine(a, b))
        )

    def lit(self, value: Any) -> Column:
        if value is None:
            return self.neutral()
        return self.inner.lit(value)


class ERecord(ErrType):
    """Error-record payload: a struct of (typically nullable) sub-errors.

    Mirrors the tutorial idiom ``ParticipantError <$> check1 ... <*> ...``
    (/root/reference/lib/Data/Valor.hs:636-642): one field per checked
    sub-rule, ``NULL`` meaning "this field had no error".
    """

    def __init__(self, fields: Mapping[str, ErrType]) -> None:
        self.fields = dict(fields)
        self.dtype = T.StructType(
            [T.StructField(n, t.dtype, True) for n, t in self.fields.items()]
        )

    def neutral(self) -> Column:
        return F.struct(
            *[t.neutral().alias(n) for n, t in self.fields.items()]
        ).cast(self.dtype)

    def combine(self, a: Column, b: Column) -> Column:
        return F.struct(
            *[
                t.combine(a.getField(n), b.getField(n)).alias(n)
                for n, t in self.fields.items()
            ]
        ).cast(self.dtype)

    def lit(self, value: Any) -> Column:
        if value is None:
            return F.lit(None).cast(self.dtype)
        assert isinstance(value, Mapping)
        return F.struct(
            *[
                (t.lit(value[n]) if n in value else t.neutral()).alias(n)
                for n, t in self.fields.items()
            ]
        ).cast(self.dtype)


class EArrayOf(ErrType):
    """``[e]`` where ``e`` is any ErrType (checkN per-element payloads)."""

    def __init__(self, inner: ErrType) -> None:
        self.inner = inner
        self.dtype = T.ArrayType(inner.dtype, True)

    def neutral(self) -> Column:
        return F.array().cast(self.dtype)

    def combine(self, a: Column, b: Column) -> Column:
        return F.coalesce(F.concat(a, b), a, b)

    def lit(self, value: Any) -> Column:
        assert isinstance(value, Sequence)
        if not value:
            return self.neutral()
        return F.array(*[self.inner.lit(v) for v in value]).cast(self.dtype)


class EMapOf(ErrType):
    """``Map String e`` payloads — per-entry errors from ``checkN_map``
    (the reference's ``checkN`` is ``Traversable t``, Valor.hs:390; Haskell
    ``Map k`` traverses VALUES, keys preserved).  Values are nullable
    (``Maybe e``: NULL = that entry passed).

    ``<>`` is ``unionWith (<>)`` (key union, value-wise combine) — the
    natural Semigroup; the reference's tests never combine these payloads,
    so any lawful choice is observationally safe."""

    def __init__(self, inner: ErrType) -> None:
        self.inner = inner
        self.dtype = T.MapType(T.StringType(), inner.dtype, True)

    def neutral(self) -> Column:
        return F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast(T.ArrayType(self.inner.dtype))
        )

    def combine(self, a: Column, b: Column) -> Column:
        merged = F.map_zip_with(
            a,
            b,
            lambda k, v1, v2: F.when(v1.isNull(), v2)
            .when(v2.isNull(), v1)
            .otherwise(self.inner.combine(v1, v2)),
        )
        return F.coalesce(merged, a, b)

    def lit(self, value: Any) -> Column:
        assert isinstance(value, Mapping)
        if not value:
            return self.neutral()
        keys = F.array(*[F.lit(str(k)) for k in value])
        vals = F.array(*[self.inner.lit(v) for v in value.values()]).cast(
            T.ArrayType(self.inner.dtype)
        )
        return F.map_from_arrays(keys, vals)


def strings() -> EArray:
    """The workhorse payload: ``array<string>`` of error messages."""
    return EArray(T.StringType())
