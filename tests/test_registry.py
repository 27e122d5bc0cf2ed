"""Registry invariants for __spark_entry__ — the driver contract.

Python dict literals keep the LAST duplicate key and module-level
re-definitions shadow silently, so a careless addition can drop a gate
with no error anywhere (it happened: a round-5 q_sessionize shadowed
the round-2 one until a board-vs-registry diff caught it). These tests
make that class of bug a pytest failure instead.
"""

from __future__ import annotations

import re
from collections import Counter

import __spark_entry__ as entry

_SRC = open(entry.__file__).read()


def test_no_duplicate_query_defs():
    defs = re.findall(r"^def (q_[a-z0-9_]+)\(", _SRC, re.M)
    dup = [k for k, c in Counter(defs).items() if c > 1]
    assert not dup, f"shadowed query defs: {dup}"


def test_no_duplicate_registry_keys():
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", _SRC, re.S)
    keys = re.findall(r'"(q_[a-z0-9_]+)":', m.group(1))
    dup = [k for k, c in Counter(keys).items() if c > 1]
    assert not dup, f"duplicate queries() keys (last-wins!): {dup}"
    assert len(keys) == len(entry.queries())


def test_no_duplicate_oracle_keys():
    # every oracle entry is a `"q_*": ...` pair somewhere after the
    # oracle_sql def (literal SQL or parquet-backed f-string)
    seg = _SRC[_SRC.index("def oracle_sql") :]
    keys = re.findall(r'"(q_[a-z0-9_]+)":', seg)
    dup = [k for k, c in Counter(keys).items() if c > 1]
    assert not dup, f"duplicate oracle keys (last-wins!): {dup}"


def test_queries_and_oracles_align():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert q == o, f"missing oracle: {sorted(q - o)}; orphan: {sorted(o - q)}"


def test_every_query_def_is_registered():
    defs = set(re.findall(r"^def (q_[a-z0-9_]+)\(", _SRC, re.M))
    reg = set(entry.queries())
    assert defs == reg, (
        f"unregistered defs: {sorted(defs - reg)}; "
        f"registered non-defs: {sorted(reg - defs)}"
    )
