#!/bin/sh
# Pre-commit guard: refuse to commit a tree whose Scala sources do not
# compile. Installed as .git/hooks/pre-commit (see CLAUDE.md). Exists
# because rounds 7 and 12 both shipped an entire round's work behind a
# one-line compile error introduced by the final snapshot commit.
#
# Only runs when the commit touches src/ or build files; doc-only commits
# pass through immediately.
set -e
cd "$(git rev-parse --show-toplevel)"

if git diff --cached --name-only | grep -qE '^(src/|build\.sbt|project/)'; then
  echo "[precommit] src/ staged -> running sbt -batch compile" >&2
  if ! sbt -batch compile >/tmp/precommit_compile.log 2>&1; then
    tail -30 /tmp/precommit_compile.log >&2
    echo "[precommit] COMPILE FAILED -- commit refused (log: /tmp/precommit_compile.log)" >&2
    exit 1
  fi
  echo "[precommit] compile green" >&2
fi
exit 0
