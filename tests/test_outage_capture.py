"""Outage-proof capture-path gates (VERDICT r4, Next #1/#2).

These verify the repo-side defenses against a wedged accelerator
tunnel: the hermetic test environment itself, and bench.py's
diagnostic-JSON failure mode. The real thing was exercised live during
the round-4 outage (dryrun_multichip(8) green and bench.py emitting the
diagnostic line with the chip hard-down); these tests keep the
machinery from regressing.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_suite_env_is_hermetic_cpu():
    """conftest.py must have scrubbed the accelerator plugin's
    activation variable (re-exec) — otherwise any backend lookup can
    hang on a wedged tunnel."""
    import jax
    assert not os.environ.get('PALLAS_AXON_POOL_IPS')
    assert jax.default_backend() == 'cpu'
    assert len(jax.devices('cpu')) >= 8  # sharding tests need 8


def test_bench_probe_failure_emits_diagnostic_json():
    """With the device probe failing, bench.py must print ONE
    machine-readable JSON line (error + last good measurement) and exit
    0 — never hang into the driver's timeout."""
    code = (
        'import bench\n'
        'bench._probe_device = lambda: (False, "simulated outage")\n'
        'bench._main_with_retry()\n'
    )
    p = subprocess.run([sys.executable, '-c', code], cwd=REPO, timeout=60,
                       text=True, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT)
    assert p.returncode == 0, p.stdout
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out['metric'] == 'openfwi_red_diffeq_inversion_time'
    assert out['unit'] == 's/sample'
    assert 'simulated outage' in out['error']
    assert 'value' not in out  # a failure must not look like a number
    assert out['last_good']['value'] > 0


def test_bench_retry_strips_repeat_flag():
    """The transient-fault retry re-execs with --repeat 1 regardless of
    how --repeat was originally spelled (exercises bench.py's actual
    filter, not a copy)."""
    sys.path.insert(0, str(REPO))
    from bench import _strip_repeat_args

    assert _strip_repeat_args(['bench.py', '--repeat', '3']) == ['bench.py']
    assert _strip_repeat_args(['bench.py', '--repeat=3']) == ['bench.py']
    assert _strip_repeat_args(
        ['bench.py', '--batch', '16', '--repeat', '2']
    ) == ['bench.py', '--batch', '16']


def test_bench_smoke_pipeline_end_to_end():
    """Execute bench.py's REAL main pipeline (argparse -> workload build
    -> timed runs -> JSON emission) on the tiny smoke workload. This is
    the coverage that was missing when a leftover reference to a removed
    parameter made every headline bench fail at runtime while the suite
    stayed green."""
    import time
    last_good = REPO / 'BENCH_LAST_GOOD.json'
    mtime_before = last_good.stat().st_mtime
    p = subprocess.run(
        [sys.executable, 'bench.py', '--smoke', '--repeat', '1'],
        cwd=REPO, timeout=900, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert p.returncode == 0, p.stdout[-2000:]
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith('{')][-1]
    out = json.loads(line)
    assert out.get('smoke') is True
    assert out['metric'] == 'openfwi_red_diffeq_inversion_time'
    assert 'error' not in out
    assert out['value'] > 0
    # smoke numbers must never become the recorded last-good headline
    assert last_good.stat().st_mtime == mtime_before


def test_bench_smoke_segmented():
    """--segment runs the same pipeline as multiple short dispatches
    (the batch-16 operating point needs this under the tunnel's
    per-dispatch execution limit) and must tag the result JSON so a
    segmented number is attributable; it must never overwrite the
    recorded last-good headline."""
    last_good = REPO / 'BENCH_LAST_GOOD.json'
    mtime_before = last_good.stat().st_mtime
    p = subprocess.run(
        [sys.executable, 'bench.py', '--smoke', '--repeat', '1',
         '--segment', '2'],
        cwd=REPO, timeout=900, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert p.returncode == 0, p.stdout[-2000:]
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith('{')][-1]
    out = json.loads(line)
    assert 'error' not in out
    assert out['segment'] == 2
    assert out['value'] > 0
    assert last_good.stat().st_mtime == mtime_before


def test_bench_smoke_bf16():
    """--bf16 runs the denoiser half-precision path end-to-end, tags the
    result JSON (a bf16 number must be attributable), and never
    overwrites the fp32 last-good headline."""
    last_good = REPO / 'BENCH_LAST_GOOD.json'
    mtime_before = last_good.stat().st_mtime
    p = subprocess.run(
        [sys.executable, 'bench.py', '--smoke', '--repeat', '1', '--bf16'],
        cwd=REPO, timeout=900, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert p.returncode == 0, p.stdout[-2000:]
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith('{')][-1]
    out = json.loads(line)
    assert 'error' not in out
    assert out['unet_precision'] == 'bf16'
    assert out['value'] > 0
    assert last_good.stat().st_mtime == mtime_before


def test_entry_fails_fast_when_probe_times_out(monkeypatch):
    """entry() must raise a diagnosable RuntimeError (not hang) when the
    device probe times out."""
    import pytest
    sys.path.insert(0, str(REPO))
    import __graft_entry__ as g

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get('timeout', 0))

    monkeypatch.setattr(subprocess, 'run', fake_run)
    with pytest.raises(RuntimeError, match='wedged or chip down'):
        g._fail_fast_if_device_wedged()


def test_hermetic_reexec_preserves_stdout():
    """The conftest re-exec must hand the child the REAL stdout.

    pytest's fd-capture is active while conftests load, so a naive exec
    leaves fd 1 pointing at a capture temp file and the child's entire
    output (dots, tracebacks, summary) dies with it — observed as a
    green 116-test run whose log was 0 bytes. Run a nested pytest with
    the plugin-activation variable set (forcing the re-exec trampoline)
    and assert the summary line actually reaches our pipe."""
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = env.get('PALLAS_AXON_POOL_IPS',
                                          '127.0.0.1') or '127.0.0.1'
    env.pop('_RDT_HERMETIC_REEXEC', None)
    p = subprocess.run(
        [sys.executable, '-m', 'pytest', 'tests/test_docs_consistency.py',
         '-q', '-p', 'no:cacheprovider'],
        cwd=REPO, env=env, timeout=300, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert p.returncode == 0, p.stdout
    assert 'passed' in p.stdout, (
        f'nested pytest exited 0 but its stdout was lost '
        f'({len(p.stdout)} bytes captured)')


def test_dryrun_subprocess_env_is_scrubbed(monkeypatch):
    """dryrun_multichip must spawn its impl with the plugin activation
    variable removed and the CPU platform pinned."""
    sys.path.insert(0, str(REPO))
    import __graft_entry__ as g

    captured = {}

    def fake_run(cmd, **kw):
        captured['cmd'] = cmd
        captured['env'] = kw['env']

        class P:
            returncode = 0
            stdout = 'ok\n'
        return P()

    monkeypatch.setattr(subprocess, 'run', fake_run)
    monkeypatch.setenv('PALLAS_AXON_POOL_IPS', '127.0.0.1')
    monkeypatch.setenv('XLA_FLAGS',
                       '--xla_force_host_platform_device_count=8')
    g.dryrun_multichip(4)
    env = captured['env']
    assert 'PALLAS_AXON_POOL_IPS' not in env
    assert env['JAX_PLATFORMS'] == 'cpu'
    assert '--xla_force_host_platform_device_count=4' in env['XLA_FLAGS']
    assert env['XLA_FLAGS'].count('xla_force_host_platform_device_count') == 1
    assert captured['cmd'][-2:] == ['--dryrun-impl', '4']
