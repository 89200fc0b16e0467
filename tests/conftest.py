"""Test configuration.

Hermetic-CPU guarantee (VERDICT r4, Next #2): the suite must be green
even when the host's accelerator plugin is wedged. The axon plugin is
activated by its ``sitecustomize`` whenever ``PALLAS_AXON_POOL_IPS`` is
set; once registered it monkey-patches ``jax._src.xla_bridge`` so that
*any* backend lookup — including ``jax.devices('cpu')`` under
``JAX_PLATFORMS=cpu`` — first initializes the accelerator client, which
hangs forever when the tunnel is down. Un-patching in-process is
fragile, so instead: if the activation variable is present, re-exec
pytest once in a cleaned environment (variable removed, CPU platform
pinned, 8 virtual devices for sharding tests per SURVEY.md §4). The
re-exec happens at conftest import time, before any test or JAX backend
init, and is guarded by a sentinel against loops.

Also enables the persistent compilation cache — the solver/U-Net scan
programs are expensive to compile and identical across test runs.
"""
import os
import sys

def _restore_real_stdio():
    """pytest's fd-level capture is deliberately active while conftests
    load (pytest issue #93), so fds 1/2 currently point at capture temp
    files. An exec'd child inherits those fds and its entire output —
    progress dots, failure tracebacks, the summary line — lands in a
    temp file that dies with it (observed: a green 104-test run whose
    log was 0 bytes). Stop global capture first so the exec'd pytest
    writes to the real stdout/stderr. The CaptureManager instance is
    only reachable through the plugin manager, which conftests don't
    get a handle to at import time, hence the gc scan; if capture is
    off (-p no:capture) nothing is found and the fds are already real.
    """
    import gc
    for obj in gc.get_objects():
        if type(obj).__name__ == 'CaptureManager':
            try:
                obj.stop_global_capturing()
            except Exception:
                pass
            return


def _invoked_via_pytest_cli():
    """Only a real pytest CLI invocation has an argv we can faithfully
    re-exec; a programmatic run (pytest.main() inside some other
    script) does not — its argv belongs to the host program, and
    exec'ing ``python -m pytest <host args>`` would run the wrong
    thing. In that case skip the re-exec and rely on the belt-and-
    braces CPU pinning below."""
    # Covers the console script (.../bin/pytest, .../bin/py.test) and
    # ``python -m pytest`` (argv[0] = .../pytest/__main__.py).
    return 'pytest' in sys.argv[0] or 'py.test' in sys.argv[0]


if (os.environ.get('PALLAS_AXON_POOL_IPS')
        and os.environ.get('_RDT_HERMETIC_REEXEC') != '1'
        and _invoked_via_pytest_cli()):
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['_RDT_HERMETIC_REEXEC'] = '1'
    _restore_real_stdio()
    # Works for both ``pytest ...`` (argv[0] = console script) and
    # ``python -m pytest ...`` (argv[0] = pytest/__main__.py).
    os.execve(sys.executable,
              [sys.executable, '-m', 'pytest'] + sys.argv[1:], env)

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax  # noqa: E402

jax.config.update('jax_enable_x64', False)
try:
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
except AttributeError:
    pass

# Belt-and-braces for environments where the plugin was registered by
# some other path than the sitecustomize activation variable: pin the
# default device to CPU so test-time computation never targets an
# accelerator. (After the re-exec above this is a no-op.)
try:
    jax.config.update('jax_default_device', jax.devices('cpu')[0])
except Exception:
    pass
