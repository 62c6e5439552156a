"""Column-expression helpers (SURVEY §2.2/§2.10).

Every reference ``.apply(lambda)`` (19 instances, ``dmCustomerProc.py:70,
87,95,146-163,182,198,219``) is replaced by a built-in Catalyst
expression here — zero Python UDFs in the parity surface, so the whole
flag pipeline stays inside whole-stage codegen.
"""

from .dq import split_valid, violation_flags
from .flags import (
    coalesce_default,
    constant_flags,
    existence_flag,
    one_hot_flags,
    range_flag,
)

__all__ = [
    "coalesce_default",
    "split_valid",
    "violation_flags",
    "constant_flags",
    "existence_flag",
    "one_hot_flags",
    "range_flag",
]
