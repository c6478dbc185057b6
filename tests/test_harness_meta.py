"""Meta-tests of the correctness harness itself: the fingerprint the
driver-mimic (tools/check_correctness.py) hashes must actually DETECT
the mismatch classes it exists to catch — otherwise an all-green sweep
proves nothing."""
from __future__ import annotations

import datetime
import importlib.util
import os
import sys


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "check_correctness.py",
    )
    spec = importlib.util.spec_from_file_location("cc_meta", path)
    mod = importlib.util.module_from_spec(spec)
    saved = sys.argv
    sys.argv = [path]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = saved
    return mod


CC = _load()


class TestFingerprintDetects:
    def test_value_change_changes_hash(self):
        a = CC.result_fingerprint(["x", "y"], [(1, "a"), (2, "b")])
        b = CC.result_fingerprint(["x", "y"], [(1, "a"), (2, "c")])
        assert a != b

    def test_row_count_change_changes_hash(self):
        a = CC.result_fingerprint(["x"], [(1,), (2,)])
        b = CC.result_fingerprint(["x"], [(1,), (2,), (2,)])
        assert a != b  # duplicated row must not collapse

    def test_row_order_is_insensitive(self):
        a = CC.result_fingerprint(["x", "y"], [(1, "a"), (2, "b")])
        b = CC.result_fingerprint(["x", "y"], [(2, "b"), (1, "a")])
        assert a == b  # deterministic-up-to-row-order contract

    def test_column_order_is_insensitive_but_names_matter(self):
        a = CC.result_fingerprint(["x", "y"], [(1, "a")])
        b = CC.result_fingerprint(["y", "x"], [("a", 1)])
        assert a == b  # same (name -> values) mapping
        c = CC.result_fingerprint(["x", "z"], [(1, "a")])
        # a renamed column reorders the sort — same here since x<z keeps
        # positions; the DRIVER catches renames via the schema compare,
        # the hash guards values. Mismatched VALUES under the rename:
        d = CC.result_fingerprint(["x", "z"], [("a", 1)])
        assert c != d

    def test_null_vs_string_null_distinct(self):
        a = CC.result_fingerprint(["x"], [(None,)])
        b = CC.result_fingerprint(["x"], [("NULL",)])
        # canon maps both to 'NULL' — this IS a known collision class;
        # pin it so a future canon change is a conscious decision
        assert a == b

    def test_cross_engine_canon_equivalences(self):
        # float 2.0 vs int 2 (DuckDB SUM(int) comes back Decimal/int,
        # Spark double) must agree
        assert CC.canon(2.0) == CC.canon(2)
        # bool True vs int 1 (DuckDB comparisons) agree
        assert CC.canon(True) == CC.canon(1)
        # date vs midnight datetime agree
        assert CC.canon(datetime.date(2025, 1, 2)) == CC.canon(
            datetime.datetime(2025, 1, 2)
        )
        # but distinct floats stay distinct at 6 significant digits
        assert CC.canon(1.00001) != CC.canon(1.00002)

    def test_nested_lists_hash_by_content(self):
        a = CC.result_fingerprint(["v"], [([1, 2],)])
        b = CC.result_fingerprint(["v"], [([2, 1],)])
        assert a != b  # array ORDER is part of the value contract
