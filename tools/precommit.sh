#!/bin/sh
# Pre-commit guard: refuse to commit a tree whose Scala sources do not
# compile. Install with: cp tools/precommit.sh .git/hooks/pre-commit
# (documented in CLAUDE.md Commands). Exists because rounds 7 and 12
# both shipped an entire round's work behind a one-line compile error
# introduced by the final snapshot commit.
#
# Only runs when the commit touches src/ or build files; doc-only commits
# pass through immediately. Compiles the INDEX, not the working tree:
# with partial staging the unstaged diff is stashed (--keep-index) for
# the duration of the compile so exactly the tree being committed is
# what gets checked, then restored.
set -e
cd "$(git rev-parse --show-toplevel)"

if git diff --cached --name-only | grep -qE '^(src/|build\.sbt|project/)'; then
  STASHED=0
  restore() {
    if [ "$STASHED" = 1 ]; then STASHED=0; git stash pop -q || true; fi
  }
  if ! git diff --quiet || [ -n "$(git ls-files --others --exclude-standard)" ]; then
    # set -e makes a failed stash push refuse the commit loudly (never
    # silently compile the dirty tree the comment above claims to exclude)
    git stash push -q --keep-index --include-untracked -m "precommit-compile"
    STASHED=1
    # plain sh does NOT run the EXIT trap on an untrapped SIGINT — a
    # Ctrl-C during the multi-minute compile would strand the unstaged
    # work in the stash; trap the signals explicitly
    trap restore EXIT
    trap 'restore; exit 130' INT TERM
  fi
  echo "[precommit] src/ staged -> running sbt -batch compile Test/compile" >&2
  if ! sbt -batch compile Test/compile >/tmp/precommit_compile.log 2>&1; then
    tail -30 /tmp/precommit_compile.log >&2
    echo "[precommit] COMPILE FAILED -- commit refused (log: /tmp/precommit_compile.log)" >&2
    exit 1
  fi
  echo "[precommit] compile green" >&2
fi
exit 0
