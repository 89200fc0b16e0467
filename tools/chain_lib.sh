# Shared helpers for the chip-evidence chain scripts
# (tools/{post_outage_chain,recovery_chain,resume_chain_r5c,
# final_evidence_r5}.sh). POSIX sh; source AFTER setting LOG/STATUS/EV.
#
# Contract expected by sourcing scripts:
#   LOG    - log directory (created by the caller)
#   STATUS - status file path (truncated by the caller)
#   FAILED - caller initializes to 0; helpers set it to 1 on failure
#   EV     - snapshot destination (defaults applied by the caller)

# --- deadline -----------------------------------------------------------
# Round-end guard: the driver benches on the SAME single chip right
# after the round ends, and two concurrent chip users wedge the tunnel
# (docs/outage_runbook.md failure mode 1). If the deadline file (epoch
# seconds; RDT_DEADLINE_FILE overrides for tests) exists, refuse to
# START a chip step within 40 min of it. Parse policy:
#   missing or empty file  -> no deadline (the watcher isn't armed yet;
#       an empty file once made $((DEADLINE - 2400)) arithmetic on an
#       empty string skip every step silently)
#   digits (+/- whitespace) -> the deadline
#   anything else           -> fail CLOSED (treat as already past):
#       someone tried to set a deadline and we can't read it, so the
#       safe interpretation is "the protected window may be now".
DEADLINE=$(cat "${RDT_DEADLINE_FILE:-/tmp/ROUND5_DEADLINE}" 2>/dev/null \
  | tr -d '[:space:]' || echo 9999999999)
case "$DEADLINE" in
  '') DEADLINE=9999999999 ;;
  *[!0-9]*)
    echo "warning: malformed deadline file content '$DEADLINE';" \
         "failing closed (all chip steps skipped)" >&2
    DEADLINE=0 ;;
esac
past_deadline() {
  [ "$(date +%s)" -gt "$((DEADLINE - 2400))" ]
}

# --- chip serialization -------------------------------------------------
# Every chain registers itself here so successors can tell a live chain
# from a finished/dead one (never kill by pattern; pidfile only). The
# pidfile is removed on normal exit, so a leftover file means the chain
# died hard (VM reset, SIGKILL) — successors treat a dead-pid file as
# "released" and a missing file as "not started yet; keep waiting".
CHAIN_PIDFILE=${CHAIN_PIDFILE:-/tmp/resume_chain.pid}
register_chain() {
  echo $$ > "$CHAIN_PIDFILE"
  trap 'rm -f "$CHAIN_PIDFILE"' EXIT
}
chain_alive() {
  # Empty/garbage pidfile content reads as dead (kill -0 '' fails),
  # which is the conservative reading for a file a crashed writer
  # may have left half-written.
  [ -f "$CHAIN_PIDFILE" ] && kill -0 "$(cat "$CHAIN_PIDFILE")" 2>/dev/null
}

# --- steps --------------------------------------------------------------
# bench.py exits 0 with an {"error": ...} diagnostic line when the
# device is unreachable (by design, for the driver) — that is still a
# FAILED capture here, so gate on the error key as well as the rc.
# bench steps self-retry internally, so no shell retry (ADVICE r4 #4).
run_bench() {
  name=$1; shift
  if past_deadline; then
    echo "SKIP $name (round deadline)" >> "$STATUS"; return
  fi
  if "$@" > "$LOG/$name.log" 2>&1 && ! grep -q '"error"' "$LOG/$name.log"; then
    echo "ok   $name" >> "$STATUS"
  else
    echo "FAIL $name (see $LOG/$name.log)" >> "$STATUS"; FAILED=1
  fi
}
# Non-bench steps get ONE shell retry on a transient UNAVAILABLE
# (runbook failure mode 3: retry in a fresh process; its own first
# dispatch absorbs the grant reclaim).
run() {
  name=$1; shift
  if past_deadline; then
    echo "SKIP $name (round deadline)" >> "$STATUS"; return
  fi
  if "$@" > "$LOG/$name.log" 2>&1; then
    echo "ok   $name" >> "$STATUS"
  elif tail -n 25 "$LOG/$name.log" | grep -qi 'UNAVAILABLE'; then
    echo "retrying $name after transient UNAVAILABLE" >&2
    if "$@" > "$LOG/$name.retry.log" 2>&1; then
      echo "ok   $name (after retry)" >> "$STATUS"
    else
      echo "FAIL $name (see $LOG/$name.retry.log)" >> "$STATUS"; FAILED=1
    fi
  else
    echo "FAIL $name (see $LOG/$name.log)" >> "$STATUS"; FAILED=1
  fi
}

# Copy status + logs into the committed evidence dir after each step so
# a mid-chain VM reset loses at most the in-flight step.
snapshot() {
  mkdir -p "$EV"
  cp "$STATUS" "$LOG"/*.log "$EV"/ 2>/dev/null || true
}
