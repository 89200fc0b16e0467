"""Policy tests for tools/chain_lib.sh — the shared step/deadline helpers
every chip-evidence chain sources (tools/{post_outage_chain,recovery_chain,
resume_chain_r5c,final_evidence_r5}.sh).

Locks the two failure modes found in review:
  * an empty or non-numeric deadline file must mean "no deadline",
    not "deadline passed" (an empty file once skipped every step silently);
  * run_bench must treat bench.py's rc-0 ``{"error": ...}`` diagnostic
    line as a FAILED capture.
No JAX / no chip — pure shell, runs everywhere.
"""
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHAIN = """#!/bin/sh
LOG=$1; STATUS="$LOG/status.txt"; : > "$STATUS"; FAILED=0
EV="$LOG/ev"
. {lib}
register_chain
run ok_step true
run_bench good_bench sh -c 'echo "{{\\"metric\\": 1}}"'
run_bench diag_bench sh -c 'echo "{{\\"error\\": \\"device down\\"}}"'
snapshot
exit $FAILED
"""


def _run_chain(tmp_path, deadline_text):
    script = tmp_path / "chain.sh"
    script.write_text(CHAIN.format(lib=REPO / "tools" / "chain_lib.sh"))
    log = tmp_path / "log"
    log.mkdir()
    dl = tmp_path / "deadline"
    if deadline_text is not None:
        dl.write_text(deadline_text)
    env = {
        "PATH": "/usr/bin:/bin",
        "RDT_DEADLINE_FILE": str(dl),
        "CHAIN_PIDFILE": str(tmp_path / "chain.pid"),
    }
    proc = subprocess.run(["sh", str(script), str(log)],
                          env=env, capture_output=True, text=True,
                          timeout=60)
    return proc, (log / "status.txt").read_text()


def test_steps_run_and_error_diagnostic_is_a_failed_capture(tmp_path):
    proc, status = _run_chain(tmp_path, deadline_text=None)
    assert "ok   ok_step" in status
    assert "ok   good_bench" in status
    # rc-0 bench with an {"error": ...} line must still FAIL the chain
    assert "FAIL diag_bench" in status
    assert proc.returncode == 1
    # snapshot copied status + logs into the evidence dir
    ev = tmp_path / "log" / "ev"
    assert (ev / "status.txt").exists()
    assert (ev / "diag_bench.log").exists()


def test_empty_deadline_file_means_no_deadline(tmp_path):
    _, status = _run_chain(tmp_path, deadline_text="")
    assert "SKIP" not in status
    assert "ok   ok_step" in status


def test_whitespace_around_numeric_deadline_is_tolerated(tmp_path):
    # a watcher writing "echo $ts > file" leaves a trailing newline;
    # that must parse as the deadline, not fail closed
    _, status = _run_chain(tmp_path, deadline_text=" 9999999999 \n")
    assert "SKIP" not in status


def test_malformed_deadline_fails_closed(tmp_path):
    """Non-empty garbage means someone TRIED to set a deadline; the safe
    reading is 'the protected pre-deadline window may be now'."""
    proc, status = _run_chain(tmp_path, deadline_text="garbage\n")
    assert status.count("SKIP") == 3
    assert proc.returncode == 0


def test_past_deadline_skips_every_chip_step(tmp_path):
    proc, status = _run_chain(tmp_path, deadline_text="1000")
    assert status.count("SKIP") == 3
    assert proc.returncode == 0


def test_pidfile_registered_during_run_and_removed_on_exit(tmp_path):
    """register_chain must remove the pidfile on normal exit so a
    finished chain's stale dead-pid entry can't make a successor's
    wait-for-release check proceed early (two concurrent chip users
    wedge the tunnel)."""
    _run_chain(tmp_path, deadline_text=None)
    assert not (tmp_path / "chain.pid").exists()
