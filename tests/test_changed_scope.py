"""Regression tests for tools/changed.py scoping (ADVICE r7: editing
module-level state shared by oracle f-strings — _NGRAM_*_CTES, _t,
TODAY — must force a FULL run, because per-query block diffs cannot
see which oracles the change rewrote)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from changed import _query_blocks, _residue  # noqa: E402

_SRC_V1 = '''
from x import y

_SHARED_CTE = "WITH g AS (SELECT 1)"
TODAY = "2026-08-13"


@_q("q900_demo", f"{_SHARED_CTE} SELECT 1 AS one", "doc")
def q900_demo(spark, sf_dir):
    return spark.range(1)


@_q("q901_other", "SELECT 2 AS two", "doc")
def q901_other(spark, sf_dir):
    return spark.range(2)
'''


def test_residue_ignores_query_block_edits():
    # editing a query BLOCK leaves the residue identical — scoping by
    # block diff stays valid
    v2 = _SRC_V1.replace("return spark.range(2)", "return spark.range(3)")
    assert _residue(_SRC_V1) == _residue(v2)
    assert _query_blocks(_SRC_V1)["q901_other"] != _query_blocks(v2)["q901_other"]


def test_residue_sees_shared_constant_edits():
    # editing the shared CTE constant (which q900's oracle f-string
    # closed over at import time) changes the residue even though every
    # query block is byte-identical — the signal queries_affected_since
    # uses to force the full run
    v2 = _SRC_V1.replace("SELECT 1)", "SELECT 99)")
    assert _residue(_SRC_V1) != _residue(v2)
    assert _query_blocks(_SRC_V1) == _query_blocks(v2)


def test_residue_sees_helper_and_import_edits():
    v2 = _SRC_V1.replace('TODAY = "2026-08-13"', 'TODAY = "2027-01-01"')
    assert _residue(_SRC_V1) != _residue(v2)
    v3 = _SRC_V1.replace("from x import y", "from x import z")
    assert _residue(_SRC_V1) != _residue(v3)
