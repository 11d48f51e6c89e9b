"""Driver artifacts stay green: dryrun_multichip on the 8-device CPU mesh.

(entry() compiles the full MiT-b3 model — too heavy for the CPU test box;
it is exercised separately on the TPU.)
"""

import jax
import pytest


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
