"""Driver entry-point regression: dryrun_multichip on virtual CPU devices."""
import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_dryrun_multichip_8():
    if len(jax.devices('cpu')) < 8:
        pytest.skip('needs 8 virtual cpu devices')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_dryrun_multichip_odd():
    if len(jax.devices('cpu')) < 3:
        pytest.skip('needs 3 virtual cpu devices')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(3)  # odd count -> shot axis 1
