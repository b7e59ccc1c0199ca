"""The third-opinion mirrors hard-code the engine's hash constants on
purpose (importing the production kernels would defeat independence),
but the CONSTANTS themselves are part of the query contract — if an
operator retunes one, every mirror must fail loudly here rather than
silently reconstructing a different sketch.
"""

from __future__ import annotations

from mapreduceframework_spark.operators import dedup as D
from tests import mirrors as M


def test_mirror_constants_match_production():
    assert M.WORD_HASH_MOD == D.WORD_HASH_MOD
    assert M.P == D.P


def test_mirror_word_hash_matches_production_formula():
    # Spot-check the formula itself against the documented definition
    # (len*2654435761 + first*97 + last) % 65536 on a few shapes,
    # including the empty-token edge (ascii('') == 0 in both engines).
    assert M.word_hash("") == 0
    assert M.word_hash("a") == (2654435761 + 97 * 97 + 97) % 65536
    assert (
        M.word_hash("spark")
        == (5 * 2654435761 + ord("s") * 97 + ord("k")) % 65536
    )
    assert M.word_hash32("spark") == (
        M.word_hash("spark") * 2654435761
    ) % 4294967296
