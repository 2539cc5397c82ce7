"""Engine exception hierarchy.

Preserves the *names* of the reference's exception model
(``/root/reference/src/load_datawarehouse/exceptions.py:3-64``) while
keeping idiomatic raised-exception semantics: the reference returns
falsy exception instances (``__bool__ = False``) and call sites test
``if result:``; here exceptions are raised, but ``__bool__`` is kept
False so code written against the reference's convention still works
when an instance is captured.
"""

from __future__ import annotations


class WarehouseError(Exception):
    """Base class for all engine errors.

    Falsy like the reference's exceptions
    (``exceptions.py:3-21``): ``bool(instance) is False``.
    """

    def __bool__(self) -> bool:  # reference parity: falsy instances
        return False


class WarehouseAPIFaked(WarehouseError):
    """A backend SDK is unavailable and a stub module was substituted."""


class WarehouseAPINotInstalled(WarehouseError):
    """A required backend driver/SDK is not installed."""


class WarehouseCredentialsMissing(WarehouseError):
    """Backend credentials could not be located."""


class WarehouseInvalidInput(WarehouseError):
    """Input data is not records / DataFrame shaped."""


class WarehouseTableGenericError(WarehouseError):
    """Catch-all table operation failure."""


class WarehouseAccessDenied(WarehouseTableGenericError):
    """Permission failure on a table operation."""


class WarehouseTableNotFound(WarehouseTableGenericError):
    """The referenced table does not exist."""


class WarehouseTableRowsInvalid(WarehouseTableGenericError):
    """Rows rejected while loading into a table."""


class WarehousePairBudgetExceeded(WarehouseError):
    """An exact pair-generating operator's candidate workload exceeds
    its configured pair budget.

    Raised *before* any quadratic work is scheduled, by operators
    whose CONTRACT is to evaluate every within-block pair (e.g. the
    exact embedding near-duplicate family): their cost is
    sum-over-blocks C(n_block, 2), which no physical plan can reduce
    — only finer blocking keys or an approximate sibling can. The
    message names the measured workload, the budget, and the
    production-path alternatives so a pipeline hits an actionable
    error instead of an unbounded job.
    """


class WarehouseRowOversize(WarehouseError):
    """A single row exceeds the chunk size limit.

    The reference *documents* this error for an un-splittable row but
    actually raises ``UnboundLocalError`` when the oversize row is
    first in a chunk (``data.py:293-307``, verified) — this engine
    always raises the documented error (SURVEY.md §7.5).
    """
