"""Fixed-seed activation fixtures for the five network ports.

Every port's full forward (plus key intermediates) must reproduce the
recorded fixture bit-closely — pins conv/FIR/norm ORDERING numerically
across refactors (VERDICT r1 missing #2; complements the torch-oracle
block tests). Re-record with scripts/record_net_activations.py ONLY for
an intentional semantic change.
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "net_activations.npz")


@pytest.fixture(scope="module")
def recorded():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from record_net_activations import compute_all

    return compute_all()


def test_activations_match_fixture(recorded):
    gold = np.load(GOLD)
    assert set(gold.files) == set(recorded)
    for k in sorted(gold.files):
        np.testing.assert_allclose(
            recorded[k], gold[k], atol=2e-5,
            err_msg=f"activation fixture mismatch: {k}")
