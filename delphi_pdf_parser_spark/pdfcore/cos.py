"""COS (Carousel Object System) value model.

The reference represents every PDF value as a tagged union ``fz_obj_s``
(src/vcl/digtypes.pas:148-190). Here PDF values map onto plain Python:

  null      -> None
  boolean   -> bool
  integer   -> int
  real      -> float
  string    -> bytes              (PDF strings are byte strings)
  name      -> Name (str subclass, so it hashes/compares like str but is
               distinguishable from a PDF string)
  array     -> list
  dict      -> dict (keys are str)
  indirect  -> IndirectRef(num, gen)
"""

from __future__ import annotations


class Name(str):
    """A PDF name object (e.g. /Type). Subclass of str."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "/" + str.__str__(self)


class IndirectRef:
    """An indirect reference ``num gen R`` (cf. fz_new_indirect,
    src/vcl/base_object_functions.pas)."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __eq__(self, other):
        return (
            isinstance(other, IndirectRef)
            and self.num == other.num
            and self.gen == other.gen
        )

    def __hash__(self):
        return hash((self.num, self.gen))

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


def to_int(obj) -> int:
    """fz_to_int semantics: non-numbers coerce to 0."""
    if isinstance(obj, bool):
        return int(obj)
    if isinstance(obj, int):
        return obj
    if isinstance(obj, float):
        return int(obj)
    return 0


def to_real(obj) -> float:
    if isinstance(obj, bool):
        return float(obj)
    if isinstance(obj, (int, float)):
        return float(obj)
    return 0.0


def to_name(obj) -> str:
    return str(obj) if isinstance(obj, Name) else ""


def is_name(obj) -> bool:
    return isinstance(obj, Name)


def is_dict(obj) -> bool:
    return isinstance(obj, dict)


def is_array(obj) -> bool:
    return isinstance(obj, list)


def is_string(obj) -> bool:
    return isinstance(obj, bytes)


def is_int(obj) -> bool:
    return isinstance(obj, int) and not isinstance(obj, bool)


def is_number(obj) -> bool:
    return isinstance(obj, (int, float)) and not isinstance(obj, bool)


def is_indirect(obj) -> bool:
    return isinstance(obj, IndirectRef)
