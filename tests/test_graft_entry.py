"""The driver entry points (__graft_entry__.py) must stay runnable.

Round-3 lesson: the LarvaNet --lr_domain_loss default flipped the
multi-exit training outputs to LR-domain and silently broke
dryrun_multichip's HR-domain loss slicing — nothing in tests/ ran the
driver's own entry, so the breakage would only have surfaced in the
round-end MULTICHIP artifact. These tests run the real entry under the
conftest's 8-device virtual CPU mesh (slow tier: the dryrun compiles
several sharded training graphs).
"""

from __future__ import annotations

import numpy as np
import pytest


def _entry_module():
    import __graft_entry__

    return __graft_entry__


@pytest.mark.slow
def test_entry_forward_compiles():
    import jax

    fn, (params, x) = _entry_module().entry()
    out = jax.jit(fn)(params, x)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    _entry_module().dryrun_multichip(8)
