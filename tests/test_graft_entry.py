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


def test_dryrun_multichip_hermetic_subprocess():
    """Run dryrun_multichip(8) the way the driver does: a fresh process
    with virtual CPU devices available but WITHOUT JAX_PLATFORMS=cpu, so
    any accelerator plugin stays default. Guards the round-1 regression
    where build-time ops dispatched to an unusable default TPU client
    (MULTICHIP_r01.json rc=1) because jax_default_device was never pinned
    to the CPU fallback."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    env['XLA_FLAGS'] = ' '.join(
        flags + ['--xla_force_host_platform_device_count=8'])
    repo = Path(__file__).parent.parent
    proc = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)'],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert 'dryrun_multichip OK' in proc.stdout
