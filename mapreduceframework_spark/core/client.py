"""The generic MapReduce client contract, re-expressed for Spark.

Reference contract (MapReduceClient.h:55-65): the user supplies
``map(K1*, V1*, ctx)`` which calls ``emit2(K2*, V2*)`` 0..n times, and
``reduce(IntermediateVec*, ctx)`` which receives ALL pairs of exactly one
key and calls ``emit3(K3*, V3*)`` 0..n times. Keys are comparator-only;
values are opaque (MapReduceClient.h:9-44).

Here the same contract is a pair of generators — ``emit`` becomes
``yield`` — plus declared Arrow-friendly schemas. The deliberate
narrowing (documented, SURVEY.md section 7 hard-part 3): keys and values
are Spark SQL types rather than arbitrary C++ classes; key equality is
the type's equality, which for orderable atomic types coincides with the
reference's order-equivalence rule ``!(a<b) && !(b<a)``
(JobContext.cpp:102-104). Truly opaque payloads can use BinaryType.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Iterable, Iterator
from typing import Any


class MapReduceClient(ABC):
    """User job: subclass, implement ``map`` and ``reduce``.

    Schemas are Spark DDL strings. ``intermediate_schema`` must be a
    two-field "<k2 name> <type>, <v2 name> <type>" schema; the first
    field is the shuffle key. ``output_schema`` is the reduce output row.
    The instance is pickled into executor tasks — keep it stateless (the
    reference's clients are too: all state flows through emit).
    """

    #: shuffle key + value, e.g. "ch string, n long"
    intermediate_schema: str = "k2 string, v2 long"
    #: reduce output, e.g. "ch string, total long"
    output_schema: str = "k3 string, v3 long"

    @abstractmethod
    def map(self, key: Any, value: Any) -> Iterator[tuple[Any, Any]]:
        """Per input record; yield (k2, v2) 0..n times (emit2
        semantics, reference MapReduceFramework.cpp:22-32)."""

    @abstractmethod
    def reduce(self, key: Any, values: list[Any]) -> Iterator[tuple[Any, ...]]:
        """Called once per distinct key with ALL its values (reference
        MapReduceClient.h:61-64); yield output rows 0..n times (emit3)."""


class CharCountClient(MapReduceClient):
    """The reference's SampleClient (SampleClient.cpp:32-66): map emits a
    per-document character histogram (user-level map-side combine),
    reduce sums counts per character."""

    intermediate_schema = "ch string, n long"
    output_schema = "ch string, cnt long"

    def map(self, key: Any, value: str) -> Iterator[tuple[str, int]]:
        counts: dict[str, int] = {}
        for c in value or "":
            counts[c] = counts.get(c, 0) + 1
        yield from counts.items()

    def reduce(self, key: str, values: list[int]) -> Iterator[tuple[str, int]]:
        yield key, sum(values)


class ModuloHistogramClient(MapReduceClient):
    """The reference's golden-test client
    (test1-1_thread_1_process.cpp:59-77): map emits (k % 100, 1), reduce
    emits the group size."""

    intermediate_schema = "key long, one long"
    output_schema = "key long, cnt long"

    def map(self, key: Any, value: int) -> Iterator[tuple[int, int]]:
        yield int(value) % 100, 1

    def reduce(self, key: int, values: list[int]) -> Iterator[tuple[int, int]]:
        yield key, len(values)


class FilterEvensClient(MapReduceClient):
    """Emit-zero-shaped client (contract allows 0 emissions,
    MapReduceClient.h:58): keeps odd values only, identity reduce."""

    intermediate_schema = "k long, v long"
    output_schema = "k long, v long"

    def map(self, key: Any, value: int) -> Iterator[tuple[int, int]]:
        if int(value) % 2 == 1:
            yield int(value), int(value)

    def reduce(self, key: int, values: list[int]) -> Iterator[tuple[int, int]]:
        for v in values:
            yield key, v


def as_rows(pairs: Iterable[tuple[Any, Any]]) -> list[tuple[Any, Any]]:
    """Helper for tests: materialize emissions."""
    return list(pairs)
