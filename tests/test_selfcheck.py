"""Regression tests for the selfcheck harness itself.

CORRECTNESS_r05 had two failures the old selfcheck could not see: a
1e-9-tolerant float compare masked an order-sensitive ulp flip, and
oracle-less queries skipped canonicalization entirely so an
``array<double>`` output crashed only inside the driver.  These pin
the hardened checker to driver semantics.
"""

from __future__ import annotations

import importlib.util
import os

import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "selfcheck",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "selfcheck.py"),
)


def _load():
    mod = importlib.util.module_from_spec(_SPEC)
    _SPEC.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sc():
    return _load()


def test_round6_boundary_flip_is_caught(sc):
    # the r5 covariance failure class: a cell flipped at the 6th
    # decimal.  The old 1e-9-RELATIVE compare scaled its tolerance by
    # |value| and its intermittency meant local runs matched; the
    # round-9 hash always distinguishes a 6th-decimal flip.
    a = pd.DataFrame({"i": [0, 1], "cov": [1.0, 0.004083]})
    b = pd.DataFrame({"i": [0, 1], "cov": [1.0, 0.004084]})
    assert sc._value_hash(sc._canon(a)) != sc._value_hash(sc._canon(b))


def test_last_ulp_sum_noise_is_tolerated(sc):
    # ...but the driver's hash demonstrably passes last-ulp
    # cross-engine double-sum noise (lm_score, green every round), so
    # the local gate must not false-alarm on it.
    a = pd.DataFrame({"v": [-3.487173201371499]})
    b = pd.DataFrame({"v": [-3.487173201371501]})
    assert sc._value_hash(sc._canon(a)) == sc._value_hash(sc._canon(b))


def test_exact_match_hashes_equal_regardless_of_order(sc):
    a = pd.DataFrame({"i": [0, 1], "cov": [1.0, 0.5]})
    b = pd.DataFrame({"cov": [0.5, 1.0], "i": [1, 0]})  # cols + rows shuffled
    assert sc._value_hash(sc._canon(a)) == sc._value_hash(sc._canon(b))


def test_negative_zero_differs_from_positive_zero(sc):
    # repr(-0.0) != repr(0.0): the hash is sign-sensitive like the
    # driver's, which is why query outputs flush -0.0 with + 0.0.
    a = pd.DataFrame({"cov": [0.0]})
    b = pd.DataFrame({"cov": [-0.0]})
    assert sc._value_hash(sc._canon(a)) != sc._value_hash(sc._canon(b))


def test_array_column_crashes_canon_like_driver(sc):
    # the embedding_whiten r5 breach: list cells are unsortable in
    # pandas — canon must raise HERE, not only in the driver.
    df = pd.DataFrame({"vec_id": [1, 2], "whitened": [[1.0], [2.0]]})
    with pytest.raises(TypeError):
        sc._canon(df)
