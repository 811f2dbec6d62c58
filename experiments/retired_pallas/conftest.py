"""Local fixtures: the retired-kernel tests are self-contained so they can
run standalone (`./run_tests.sh experiments/retired_pallas`) without the
main suite's conftest. Default collection covers tests/ only (pyproject
``testpaths``) — retired code is opt-in."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
