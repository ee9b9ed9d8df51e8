"""Driver-hash-safety regression tests (VERDICT r12 tasks #2/#4).

The r12 driver row for ``es_esql_lookup_join`` was red with
``rows_match=True, schema_match=True, hash_match=False``: the query's
final schema carried a DECIMAL aggregate, and the driver's hasher
renders trailing-zero Decimals scale-preserving on one engine side
('284019.50') and float-style on the other ('284019.5') — while the
local replica (`tools/check_oracle.py`) used plain ``repr`` on both
sides and passed.  These tests pin the replica's now driver-shaped
divergence so the class can never again pass locally and fail at the
gate.  Run against the PRE-fix gate query (decimal ``bal_total``),
``test_decimal_trailing_zero_diverges`` is exactly the failure the
driver reported.
"""

from decimal import Decimal

import pytest

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import frame_signature, normalize_cell  # noqa: E402


class TestDecimalDivergence:
    def test_decimal_trailing_zero_diverges(self):
        # the exact r12 failure values (VERDICT r12 "What's wrong")
        cols = ["n_name", "bal_total"]
        rows = [
            ("ALGERIA", Decimal("284019.50")),
            ("BRAZIL", Decimal("318117.40")),
            ("CANADA", Decimal("244624.40")),
        ]
        _, _, spark_hash, _ = frame_signature(cols, rows, side="spark")
        _, _, duck_hash, _ = frame_signature(cols, rows, side="duckdb")
        assert spark_hash != duck_hash, (
            "a trailing-zero Decimal column must hash-diverge between "
            "sides in the replica, as it does at the driver gate"
        )

    def test_decimal_cell_renderings(self):
        v = Decimal("284019.50")
        assert normalize_cell(v, side="spark") == "284019.50"
        assert normalize_cell(v, side="duckdb") == "284019.5"

    def test_double_rendering_is_side_invariant(self):
        # the fix: ROUND(CAST(... AS DOUBLE), 2) on both sides
        cols = ["n_name", "bal_total"]
        rows = [("ALGERIA", 284019.5), ("BRAZIL", 318117.4)]
        _, _, h1, _ = frame_signature(cols, rows, side="spark")
        _, _, h2, _ = frame_signature(cols, rows, side="duckdb")
        assert h1 == h2

    def test_nan_is_side_invariant(self):
        nan = float("nan")
        assert normalize_cell(nan, "spark") == normalize_cell(nan, "duckdb") == "NaN"


class TestRegistryHasNoDecimalFinals:
    """Schema-level guard: no registry query may end in a decimal /
    float32 / interval / timestamp_ntz column (tools/type_audit.py is
    the full sweep; this pins the one query that regressed)."""

    def test_lookup_join_final_schema_is_double(self, spark):
        import __spark_entry__ as entrymod

        df = entrymod.queries()["es_esql_lookup_join"](
            spark, "/root/testdata/sf0.001"
        )
        dtypes = dict(df.dtypes)
        assert dtypes["bal_total"] == "double", dtypes
        assert not any("decimal" in t for t in dtypes.values()), dtypes
